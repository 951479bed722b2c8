"""ES `nested` query semantics (Q9): independent sub-document scoring
with parent-max, and the defining nested-vs-flattened disagreement.

Reference: the `value` field is mapped as a true ES nested object
(app/es/index/claims.go:17-19) and queried by autocomplete
(app/actions/auto_complete.go:69).  A bool.must inside a nested clause
requires all terms to co-occur in the SAME sub-document; a flattened
mapping matches them anywhere in the parent.
"""

import numpy as np
import pyarrow as pa
import pytest

from lighthouse_ray.query.nested import nested_corpus_stats, nested_match_topk

W = 4  # small window so cross-chunk layouts are easy to construct


def _corpus():
    # doc 0: alpha and beta inside one 4-token chunk  -> true nested match
    # doc 1: alpha in chunk 0, beta in chunk 1        -> flattened-only match
    # doc 2/3: one term only                           -> match in neither mode
    # doc 4: both terms in the SECOND chunk            -> true nested match
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha beta filler filler",
                    "alpha filler filler filler beta filler filler filler",
                    "alpha filler filler filler",
                    "beta filler filler filler",
                    "x y z w alpha beta pad pad",
                ]
            ),
        }
    )


def _factory():
    import ray.data as rd

    return lambda: rd.from_arrow(_corpus()).repartition(3)


def test_nested_requires_same_subdoc(ray_session):
    res = nested_match_topk(_factory(), ["alpha", "beta"], window=W, k=10, mode="nested")
    assert set(res["doc_id"]) == {0, 4}


def test_flattened_matches_across_subdocs(ray_session):
    res = nested_match_topk(_factory(), ["alpha", "beta"], window=W, k=10, mode="flattened")
    # the flattened mapping wrongly admits doc 1 (terms in different
    # sub-documents) — the disagreement the nested mapping exists to fix
    assert set(res["doc_id"]) == {0, 1, 4}


def test_nested_wins_where_they_disagree(ray_session):
    nested = nested_match_topk(_factory(), ["alpha", "beta"], window=W, k=10, mode="nested")
    flat = nested_match_topk(_factory(), ["alpha", "beta"], window=W, k=10, mode="flattened")
    disagree = set(flat["doc_id"]) - set(nested["doc_id"])
    assert disagree == {1}
    # ground truth: no 4-token chunk of doc 1 contains both terms
    toks = _corpus()["text"][1].as_py().split()
    chunks = [set(toks[i : i + W]) for i in range(0, len(toks), W)]
    assert not any({"alpha", "beta"} <= c for c in chunks)


def test_subdoc_scored_independently(ray_session):
    # score_mode max: parent score equals its best sub-doc's BM25, with
    # stats over the nested-doc corpus — verified against a hand rollup
    import math

    nc, avgdl, idf = nested_corpus_stats(_factory()(), ["alpha", "beta"], window=W)
    # hand count: chunks = ceil(4/4)+ceil(8/4)+1+1+ceil(8/4) = 1+2+1+1+2 = 7
    assert nc == 7
    assert avgdl == pytest.approx((4 + 8 + 4 + 4 + 8) / 7)
    # chunk-level df: alpha in {d0c0, d1c0, d2c0, d4c1} = 4; beta likewise 4
    for v in idf:
        assert v == pytest.approx(math.log(1 + (7 - 4 + 0.5) / (4 + 0.5)))

    res = nested_match_topk(_factory(), ["alpha", "beta"], window=W, k=10, mode="nested")
    k1, b = 1.2, 0.75
    # doc 0's matching chunk: dl=4, tf=1 for both terms
    dl, tf = 4.0, 1.0
    expect = sum(
        i * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)) for i in idf
    )
    got = float(res.set_index("doc_id").loc[0, "score"])
    assert got == pytest.approx(round(expect, 6))


def test_score_modes_rank_differently(ray_session):
    import ray.data as rd

    # doc 0: one matching chunk with DOUBLE tf (strong single sub-doc)
    # doc 1: two matching chunks each with single tf (several mediums)
    corpus = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([
            "alpha beta alpha beta",                      # chunk0: tf=2 each
            "alpha beta pad pad alpha beta pad pad",      # chunks 0,1: tf=1 each
        ]),
    })
    fac = lambda: rd.from_arrow(corpus)
    by = {
        sm: nested_match_topk(fac, ["alpha", "beta"], window=W, k=10,
                              mode="nested", score_mode=sm).set_index("doc_id")["score"]
        for sm in ("max", "avg", "sum")
    }
    # max and avg: doc 0's strong chunk wins; sum rewards doc 1's two chunks
    assert by["max"].loc[0] > by["max"].loc[1]
    assert by["avg"].loc[0] > by["avg"].loc[1]
    assert by["sum"].loc[1] > by["sum"].loc[0]
    # avg == sum/count for doc 1 (2 matching chunks)
    assert by["avg"].loc[1] == pytest.approx(round(by["sum"].loc[1] / 2, 6), abs=2e-6)


def test_parallelism_invariant(ray_session):
    import ray.data as rd

    one = nested_match_topk(
        lambda: rd.from_arrow(_corpus()).repartition(1),
        ["alpha", "beta"], window=W, k=10, mode="nested",
    )
    many = nested_match_topk(
        lambda: rd.from_arrow(_corpus()).repartition(5),
        ["alpha", "beta"], window=W, k=10, mode="nested",
    )
    assert np.array_equal(one["doc_id"].to_numpy(), many["doc_id"].to_numpy())
    assert np.allclose(one["score"].to_numpy(), many["score"].to_numpy())
