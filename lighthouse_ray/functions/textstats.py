"""Text analysis for training-data curation: language-ID heuristic,
quality scoring, token counting (quality/fingerprint live in
pipelines/driver_queries.py with their SQL oracles; the language-ID
rule here is deliberately simple enough to mirror exactly in SQL)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import flat_tokens

# marker stopword sets per language (tiny n-gram-free heuristic; the
# POINT is the distributed shape + SQL-mirrorable determinism, not
# state-of-the-art langid)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "los", "las", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}
LANGS_ORDERED = tuple(sorted(LANG_MARKERS))  # deterministic tie-break order


def lang_id_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Predict language by marker-token counts; argmax with ties broken
    by language code order, 'und' (undetermined) when no marker hits."""
    import pyarrow.compute as pc

    parents, _pos, terms, n = flat_tokens(batch[text_col])
    scores = np.zeros((n, len(LANGS_ORDERED)), dtype=np.int64)
    for li, lang in enumerate(LANGS_ORDERED):
        hit = pc.is_in(terms, value_set=pa.array(list(LANG_MARKERS[lang]))).to_numpy(
            zero_copy_only=False
        )
        if hit.any():
            scores[:, li] = np.bincount(parents[hit], minlength=n)
    best = scores.argmax(axis=1)
    bestv = scores.max(axis=1)
    pred = np.where(bestv > 0, np.asarray(LANGS_ORDERED, dtype=object)[best], "und")
    return pa.table(
        {
            id_col: batch[id_col],
            "pred_lang": pa.array(pred.tolist(), type=pa.string()),
            "marker_hits": pa.array(bestv),
        }
    )


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: lang_id_batch(b, text_col, id_col), batch_format="pyarrow"
    )


def sql_lang_id(text_col: str = "text") -> str:
    """DuckDB expression mirroring :func:`lang_id_batch` exactly."""
    from ..analysis import sql_tokens_expr

    tok = sql_tokens_expr(text_col)
    counts = []
    for lang in LANGS_ORDERED:
        in_list = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        counts.append(f"len(list_filter(toks, t -> t IN ({in_list}))) AS c_{lang}")
    # argmax with tie-break by language order = first lang reaching the max
    greatest = "greatest(" + ", ".join(f"c_{lang}" for lang in LANGS_ORDERED) + ")"
    case = "CASE "
    for lang in LANGS_ORDERED:
        case += f"WHEN c_{lang} = m THEN '{lang}' "
    case += "END"
    cols = ", ".join(counts)
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
c AS (SELECT doc_id, {cols} FROM t),
m AS (SELECT *, {greatest} AS m FROM c)
SELECT doc_id,
       CASE WHEN m = 0 THEN 'und' ELSE {case} END AS pred_lang,
       CAST(m AS BIGINT) AS marker_hits
FROM m
"""
