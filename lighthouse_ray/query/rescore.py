"""Two-phase rescoring: cheap BM25 window, expensive second-pass query.

Standard-engine ``rescore`` semantics: rank the corpus with the cheap
query (block-max WAND BM25), take the top ``window`` hits, re-score
ONLY those with a costlier signal — here positional exact-phrase
presence — and re-rank the window.  Docs outside the window never pay
the expensive phrase check, which is the point: at 10^12 docs the
phrase verification (position-list intersection) runs on ``window``
candidates per replica, not on every match.

Ordering contract matches the rest of the query stack: ties break on
the EXTERNAL doc id ascending (pass ``doc_ids``), so results are
identical across ordinal assignments / cluster widths.
"""

from __future__ import annotations

import numpy as np

from ..index import IndexReader

# extra depth fetched beyond the window so boundary score-ties resolve
# on doc_id identically to a total-order sort (same margin trick as the
# driver's bm25 gate)
_TIE_MARGIN = 30


def rescore_phrase_topk(
    reader: IndexReader,
    field: str,
    terms: list[str],
    phrase: list[str],
    *,
    window: int = 50,
    k: int = 10,
    bonus: float = 2.0,
    doc_ids: np.ndarray | None = None,
    live: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Top-``k`` ``(doc_id, score)`` where score = window-BM25 + bonus
    for docs whose ``field`` contains ``phrase`` as adjacent tokens.

    The window itself is cut in (bm25 desc, doc_id asc) order; the
    re-ranked result is (rescored desc, doc_id asc).
    """
    from .scoring import Scorer
    from .wand import wand_topk

    if doc_ids is None:
        doc_ids = reader.docmeta()["path"].to_numpy().astype(np.int64)

    hits = wand_topk(
        reader, field, terms, k=min(window + _TIE_MARGIN, reader.n_docs), live=live
    )
    if not hits:
        return []
    ords = np.fromiter((d for d, _ in hits), dtype=np.int64, count=len(hits))
    scores = np.fromiter((s for _, s in hits), dtype=np.float64, count=len(hits))
    ids = doc_ids[ords]
    order = np.lexsort((ids, -scores))[:window]
    ords, ids, scores = ords[order], ids[order], scores[order]

    # expensive pass on the window only: positional phrase presence,
    # restricted to the window's ordinals (position-chain work is
    # O(window), not O(df))
    ph = Scorer(reader).phrase(
        field, list(phrase), slop=0, within=np.sort(ords)
    )
    rescored = scores + np.where(ph.mask[ords], bonus, 0.0)

    out = np.lexsort((ids, -rescored))[:k]
    return [(int(ids[i]), float(rescored[i])) for i in out]
