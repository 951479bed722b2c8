"""Query-time synonym expansion.

The reference's analyzer pipeline rewrites hand-curated query variants
before matching (special.go:5-41); a synonym filter generalises that:
each query term is expanded through a term -> synonyms map, and the
union (order-preserving, deduplicated) scores as a plain OR-of-terms
BM25 query.  Expansion happens at QUERY time only — the index stores
surface terms — so the map can change without reindexing, and a q-term
expanded to g synonyms costs g posting-list reads, never a reindex.

This matches the "query-time synonyms" semantics of standard search
engines (each synonym scores with its own document frequency); there is
no index-time graph injection.  The map is tiny, immutable, and shipped
by value to query replicas.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence


def expand_terms(
    terms: Sequence[str], synonyms: Mapping[str, Sequence[str]]
) -> list[str]:
    """Expand each term through the synonym map; order-preserving union.

    A term's synonyms are inserted right after it, so downstream
    tie-breaks that depend on term order stay stable; duplicates keep
    their first position.
    """
    out: list[str] = []
    for t in terms:
        out.append(t)
        out.extend(synonyms.get(t, ()))
    return list(dict.fromkeys(out))
