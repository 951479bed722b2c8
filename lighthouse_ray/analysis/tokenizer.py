"""Code-aware tokenizer — the engine's single text-analysis definition.

The reference delegates analysis to Elasticsearch's *standard analyzer*
(dynamic mapping, no custom analyzers: reference app/es/index/claims.go:9-32
— Unicode word segmentation + lowercase, no stemming/stopwords) and adds
its own name stripping/compression (app/model/claim.go:170-185,
app/actions/search/query.go:193,212).  For a source-code corpus the analog
is an *identifier-splitting* tokenizer:

    1. split camelCase boundaries        ``getHTTPResponse -> get HTTP Response``
    2. lowercase
    3. split on runs of non-``[a-z0-9]`` (this covers snake_case, paths,
       punctuation, whitespace), dropping empty tokens

Three implementations of the SAME definition live here and MUST stay in
lock-step (tests assert it):

- :func:`tokenize_text`     — pure-Python (``re``), used by the query parser
  and the in-memory oracle scorer.
- :func:`tokenize_array` / :func:`flat_tokens` — vectorized pyarrow.compute
  (RE2) kernels, used in the hot ``map_batches`` indexing path.  No Python
  loop over rows anywhere.
- :func:`sql_tokens_expr`   — the equivalent DuckDB SQL expression (DuckDB
  regexes are also RE2), used to build the ``oracle_sql()`` strings the
  driver checks against.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Boundary 1 first: "HTTPResponse" -> "HTTP Response"; then boundary 2:
# "getHTTP" -> "get HTTP".  Order matters and is identical in all three
# implementations.
CAMEL_BOUNDARY_1 = r"([A-Z]+)([A-Z][a-z])"
CAMEL_BOUNDARY_2 = r"([a-z0-9])([A-Z])"
TOKEN_SPLIT = r"[^a-z0-9]+"

_RE_B1 = re.compile(CAMEL_BOUNDARY_1)
_RE_B2 = re.compile(CAMEL_BOUNDARY_2)
_RE_SPLIT = re.compile(TOKEN_SPLIT)


# ---------------------------------------------------------------------------
# Pure-Python reference implementation
# ---------------------------------------------------------------------------

def tokenize_text(text: str | None) -> list[str]:
    """Tokenize one string. Reference implementation (query side / oracle)."""
    if not text:
        return []
    x = _RE_B1.sub(r"\1 \2", text)
    x = _RE_B2.sub(r"\1 \2", x)
    x = x.lower()
    return [t for t in _RE_SPLIT.split(x) if t]


# ---------------------------------------------------------------------------
# Vectorized Arrow implementation (the hot path)
# ---------------------------------------------------------------------------

def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """camel-split + lowercase a string array (RE2 kernels, no row loop)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.replace_substring_regex(arr, pattern=CAMEL_BOUNDARY_1, replacement=r"\1 \2")
    x = pc.replace_substring_regex(x, pattern=CAMEL_BOUNDARY_2, replacement=r"\1 \2")
    return pc.utf8_lower(x)


def tokenize_array(arr: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Tokenize a string array into ``list<string>`` (empties removed)."""
    parents, _pos, terms, n_rows = flat_tokens(arr)
    counts = np.bincount(parents, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), terms)


def flat_tokens(
    arr: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, pa.Array, int]:
    """Flatten a string column to its token stream.

    Returns ``(parent_row_idx, position_in_row, term, n_rows)`` where the
    first two are int64 numpy arrays and ``term`` is a pyarrow string array.
    Positions count only non-empty tokens, 0-based per row — these are the
    positions stored in the positional postings (phrase queries, reference
    app/actions/search/query.go:136-140 ``match_phrase``).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_rows = len(arr)
    norm = normalize_array(arr)
    toks = pc.split_pattern_regex(norm, pattern=TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parents_all = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    keep = mask.to_numpy(zero_copy_only=False).astype(bool)
    terms = flat.filter(mask)
    parents = parents_all[keep].astype(np.int64, copy=False)
    # positions: running index within each parent (parents is non-decreasing)
    if len(parents):
        uniq, starts, counts = np.unique(parents, return_index=True, return_counts=True)
        pos = np.arange(len(parents), dtype=np.int64) - np.repeat(starts, counts)
    else:
        pos = np.zeros(0, dtype=np.int64)
    return parents, pos, terms, n_rows


# ---------------------------------------------------------------------------
# DuckDB oracle expression (kept textually next to the kernels on purpose)
# ---------------------------------------------------------------------------

def sql_norm_expr(col: str) -> str:
    """DuckDB expression: camel-split + lowercase of ``col``."""
    return (
        "lower(regexp_replace(regexp_replace({c}, "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'))"
    ).format(c=col)


def sql_tokens_expr(col: str) -> str:
    """DuckDB expression producing the token list (empties removed)."""
    return (
        "list_filter(regexp_split_to_array({norm}, '[^a-z0-9]+'), t -> t <> '')"
    ).format(norm=sql_norm_expr(col))
