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


def levenshtein_batch(terms: pa.Array | pa.ChunkedArray, query: str) -> np.ndarray:
    """Exact Levenshtein distance from every term in the batch to
    ``query``, vectorized: one DP over a padded byte matrix (rows =
    terms) built straight from the Arrow buffers, so the per-batch cost
    is ``len(query) x max_term_len`` numpy column ops — no Python loop
    over the vocabulary.  Matches DuckDB ``levenshtein()`` exactly
    (unit insert/delete/substitute; a transposition costs 2).

    Terms must be ASCII (true by tokenizer construction: [a-z0-9]+),
    so bytes == characters.  This is the spell-suggestion / fuzzy-term
    primitive (reference ``fuzziness=AUTO``, app/actions/search/
    query.go:131,177 — the ES term-suggester analog)."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    nd = len(terms)
    if nd == 0:
        return np.zeros(0, dtype=np.int64)
    if terms.null_count:
        import pyarrow.compute as pc

        terms = pc.fill_null(terms, "")
    offs = np.frombuffer(terms.buffers()[1], dtype=np.int32)[
        terms.offset : terms.offset + nd + 1
    ].astype(np.int64)
    data = np.frombuffer(terms.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    lens = np.diff(offs)
    width = int(lens.max()) if nd else 0
    mat = np.zeros((nd, width), dtype=np.uint8)
    if width:
        rows = np.repeat(np.arange(nd, dtype=np.int64), lens)
        cols = np.arange(len(data), dtype=np.int64) - np.repeat(offs[:-1], lens)
        mat[rows, cols] = data
    q = np.frombuffer(query.encode("ascii"), dtype=np.uint8)
    n = len(q)
    prev = np.broadcast_to(
        np.arange(width + 1, dtype=np.int32), (nd, width + 1)
    ).copy()
    for i in range(1, n + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (mat != q[i - 1]).astype(np.int32)
        for j in range(1, width + 1):
            np.minimum(prev[:, j] + 1, prev[:, j - 1] + sub[:, j - 1], out=cur[:, j])
            np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
        prev = cur
    return prev[np.arange(nd), lens].astype(np.int64)


def unigram_xent(ds, *, vocab: int = 65536, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Per-document cross-entropy under the corpus unigram LM — the
    perplexity quality filter of CCNet (Wenzek et al. 2020) with a
    unigram model instead of KenLM (the distributed shape is the
    point; the model is pluggable).  The model keeps the top-``vocab``
    terms by (cf desc, term asc); out-of-vocabulary tokens score at
    count 1 (logprob ln(1/total)).

    Two narrow passes: (1) per-batch partial term counts -> one small
    groupby-sum; only the top-``vocab`` model rows and the exact int64
    token total reach the driver, broadcast once via ``ray.put`` (at
    10^9-doc scale the model is top-V of a huge vocabulary — bounded
    by construction).  (2) a streaming scoring pass: ``pc.index_in``
    token lookup against the broadcast terms, per-row logprob sums
    via ``np.bincount`` — no shuffle, no per-row Python.  Documents
    with zero tokens are dropped (no defined entropy), matching the
    SQL GROUP BY over unnested tokens."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _p, _pos, terms, _n = flat_tokens(b[text_col])
        t = pa.table({"term": terms})
        agg = t.group_by("term", use_threads=False).aggregate([([], "count_all")])
        return pa.table({"term": agg["term"], "n": agg["count_all"].cast(pa.int64())})

    cf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="cf"))
        .materialize()
    )
    total = int(cf.sum("cf"))
    top = cf.sort(["cf", "term"], descending=[True, False]).limit(vocab).to_pandas()
    model_terms = pa.array(top["term"], type=pa.string())
    logp = np.log(top["cf"].to_numpy().astype(np.float64) / total)
    ln_oov = float(np.log(1.0 / total))
    ref = ray.put((model_terms, logp, ln_oov))

    empty = pa.table({
        id_col: pa.array([], type=pa.int64()),
        "xent": pa.array([], type=pa.float64()),
    })

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _r

        terms_m, lp, oov = _r.get(_ref)
        parents, _pos, toks, n = flat_tokens(b[text_col])
        if len(parents) == 0:
            return empty
        idx = pc.fill_null(pc.index_in(toks, value_set=terms_m), -1).to_numpy(
            zero_copy_only=False
        )
        lpv = np.where(idx >= 0, lp[np.maximum(idx, 0)], oov)
        sums = np.bincount(parents, weights=lpv, minlength=n)
        counts = np.bincount(parents, minlength=n)
        has = counts > 0
        xent = np.floor(-sums[has] / counts[has] * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: pc.take(b[id_col], pa.array(np.flatnonzero(has))).cast(pa.int64()),
            "xent": pa.array(xent),
        })

    return ds.map_batches(score, batch_format="pyarrow")
