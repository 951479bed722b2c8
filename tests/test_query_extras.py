"""Round-3 query-surface extras: keyset pagination, synonym expansion,
two-phase rescoring.

Each is conformance-tested against a brute-force reference built from
the exhaustive scorer / the raw corpus text, over an external doc-id
mapping that PERMUTES ordinals — so tie-breaks are proven to follow the
external id, not the internal ordinal.
"""

import numpy as np
import pytest

from lighthouse_ray.analysis import tokenize_text
from lighthouse_ray.config import IndexConfig
from lighthouse_ray.corpus import gen_corpus

CFG = IndexConfig(num_doc_parts=8, num_term_shards=16, salt_range=64, df_sample_mod=10)
N_DOCS = 400


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from lighthouse_ray.build import build_index
    from lighthouse_ray.index import IndexReader

    corpus = gen_corpus(N_DOCS)
    idx = str(tmp_path_factory.mktemp("qextras") / "index")
    build_index(rd.from_arrow(corpus), idx, CFG)
    reader = IndexReader(idx)
    # external ids permute ordinals (x -> 7919x mod n is a bijection for
    # gcd(7919, n) = 1): tie-breaks must follow THESE, not ordinals
    doc_ids = (np.arange(reader.n_docs, dtype=np.int64) * 7919) % reader.n_docs
    assert len(np.unique(doc_ids)) == reader.n_docs
    return reader, doc_ids, corpus


def _full_ranking(reader, doc_ids, terms):
    """Brute-force total ranking [(doc_id, score)] in
    (score desc, doc_id asc) order over all matching docs."""
    from lighthouse_ray.query.wand import exhaustive_topk

    hits = exhaustive_topk(reader, "content", terms, k=reader.n_docs)
    ids = doc_ids[np.array([d for d, _ in hits], dtype=np.int64)]
    scores = np.array([s for _, s in hits], dtype=np.float64)
    order = np.lexsort((ids, -scores))
    return [(int(ids[i]), float(scores[i])) for i in order]


@pytest.mark.parametrize("q", ["merge sorted runs", "import", "window sort key value table"])
@pytest.mark.parametrize("size", [7, 25])
def test_search_after_walk_equals_full_ranking(setup, q, size):
    """Walking every page via cursors reproduces the complete ranking —
    no gaps, no repeats, scores identical."""
    from lighthouse_ray.query.pagination import search_after_topk

    reader, doc_ids, _ = setup
    terms = tokenize_text(q)
    want = _full_ranking(reader, doc_ids, terms)

    got, cursor, pages = [], None, 0
    while True:
        page, cursor = search_after_topk(
            reader, "content", terms, size=size, after=cursor, doc_ids=doc_ids
        )
        if not page:
            break
        got.extend(page)
        pages += 1
        assert len(page) <= size
    assert pages >= (len(want) + size - 1) // size
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)


def test_search_after_no_matches(setup):
    from lighthouse_ray.query.pagination import search_after_topk

    reader, doc_ids, _ = setup
    page, cursor = search_after_topk(
        reader, "content", tokenize_text("nonexistent zzz"), size=10, doc_ids=doc_ids
    )
    assert page == [] and cursor is None


def test_search_after_cursor_is_stable_mid_stream(setup):
    """Re-fetching the same cursor returns the same page (the cursor is
    a pure sort key, not server-side state)."""
    from lighthouse_ray.query.pagination import search_after_topk

    reader, doc_ids, _ = setup
    terms = tokenize_text("import")
    _p1, cur = search_after_topk(reader, "content", terms, size=10, doc_ids=doc_ids)
    a, _ = search_after_topk(reader, "content", terms, size=10, after=cur, doc_ids=doc_ids)
    b, _ = search_after_topk(reader, "content", terms, size=10, after=cur, doc_ids=doc_ids)
    assert a == b and len(a) == 10


def test_expand_terms_order_preserving_union():
    from lighthouse_ray.analysis.synonyms import expand_terms

    syn = {"merge": ("join", "fuse"), "sort": ("order",), "x": ("merge",)}
    assert expand_terms(["merge", "sort"], syn) == ["merge", "join", "fuse", "sort", "order"]
    # duplicates keep first position; expansion of an expansion does NOT recurse
    assert expand_terms(["x", "merge"], syn) == ["x", "merge", "join", "fuse"]
    assert expand_terms([], syn) == []


@pytest.mark.parametrize("window,bonus", [(30, 2.0), (5, 100.0)])
def test_rescore_phrase_vs_bruteforce(setup, window, bonus):
    """rescore == (window cut in (bm25 desc, id asc)) + bonus-if-phrase
    + re-rank, with phrase presence computed from the raw corpus text."""
    from lighthouse_ray.query.rescore import rescore_phrase_topk

    reader, doc_ids, corpus = setup
    terms = tokenize_text("merge sorted runs")
    phrase = ["merge", "sorted"]

    ranked = _full_ranking(reader, doc_ids, terms)[:window]
    id_to_ord = np.empty_like(doc_ids)
    id_to_ord[doc_ids] = np.arange(len(doc_ids))
    texts = corpus["content"].to_pylist()

    def has_phrase(doc_id: int) -> bool:
        toks = tokenize_text(texts[int(id_to_ord[doc_id])])
        return any(
            toks[i : i + len(phrase)] == phrase for i in range(len(toks) - len(phrase) + 1)
        )

    want = [(d, s + (bonus if has_phrase(d) else 0.0)) for d, s in ranked]
    want.sort(key=lambda x: (-x[1], x[0]))
    want = want[:10]

    got = rescore_phrase_topk(
        reader, "content", terms, phrase,
        window=window, k=10, bonus=bonus, doc_ids=doc_ids,
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)
    if bonus == 100.0:
        # with a dominant bonus, every phrase doc in the window must
        # outrank every non-phrase doc: proves the bonus actually landed
        flags = [s > 50.0 for _, s in got]
        assert flags == sorted(flags, reverse=True)
