"""Trigram-indexed regex search: planner soundness + end-to-end parity
with a brute-force regex scan."""

import re

import numpy as np
import pyarrow as pa
import pytest

from lighthouse_ray.corpus import gen_corpus
from lighthouse_ray.functions.regex_search import (
    _literal_dnf,
    build_trigram_index,
    plan_regex,
    regex_search,
)

PATTERNS = [
    r"import [a-z]+_flush",
    r"(quick|lazy) [a-z]+",
    r"msg = \"(scan|merge) ",
    r"def scan[A-Z]",
    r"buffer_count, [0-9]+\)",
    r"= merge_buffer\(",
    r"[0-9]\)",                  # unplannable -> full scan
    r"merge_sorted_zzz",         # plannable, zero hits
]


def _ids(df):
    return sorted(df["doc_id"].tolist()) if "doc_id" in df.columns else []


def _docs_table(n=300):
    t = gen_corpus(n)
    return pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t["content"],
    })


def test_literal_dnf_soundness_fuzz():
    """Every match of the pattern must contain all literals of at least
    one DNF group (checked against Python re on the corpus texts)."""
    texts = gen_corpus(150)["content"].to_pylist()
    for pat in PATTERNS:
        dnf = _literal_dnf(pat)
        rx = re.compile(pat)
        for txt in texts:
            if rx.search(txt):
                assert any(all(lit in txt for lit in g) for g in dnf), (
                    f"unsound plan for {pat!r}"
                )


def test_plan_regex_shapes():
    assert plan_regex(r"[0-9]{4}") is None
    assert plan_regex(r"(?i)Merge") is None
    assert plan_regex(r"ab") is None
    g = plan_regex(r"import\s+numpy")
    assert g is not None and len(g) == 1 and len(g[0]) == 7  # 4+4 tris, shared none
    g = plan_regex(r"(foox|barz)qux")
    assert g is not None and len(g) == 2


def test_regex_search_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    docs = _docs_table(300)
    ds = rd.from_arrow(docs).repartition(4)
    idx = build_trigram_index(ds, str(tmp_path / "tri"), num_parts=16)
    texts = docs["text"].to_pylist()
    for pat in PATTERNS:
        rx = re.compile(pat)
        want = sorted(i for i, t in enumerate(texts) if rx.search(t))
        got = _ids(regex_search(rd.from_arrow(docs).repartition(4), idx, pat).to_pandas())
        assert got == want, pat
    # at least one pattern must really exercise the pruned path
    assert plan_regex(PATTERNS[0]) is not None


def test_regex_search_without_index_matches(ray_session):
    import ray.data as rd

    docs = _docs_table(120)
    texts = docs["text"].to_pylist()
    pat = r"msg = \"(scan|merge) "
    want = sorted(i for i, t in enumerate(texts) if re.search(pat, t))
    got = _ids(regex_search(rd.from_arrow(docs), None, pat).to_pandas())
    assert got == want and len(want) > 0


def test_candidate_pruning_prunes(ray_session, tmp_path):
    """The planner's candidate set must be a (strict, here) subset of
    the corpus and a superset of the true matches."""
    import ray.data as rd

    from lighthouse_ray.functions.regex_search import _candidates

    docs = _docs_table(300)
    ds = rd.from_arrow(docs).repartition(4)
    idx = build_trigram_index(ds, str(tmp_path / "tri"), num_parts=16)
    pat = r"= merge_buffer\("
    cand = _candidates(idx, plan_regex(pat))
    texts = docs["text"].to_pylist()
    want = {i for i, t in enumerate(texts) if re.search(pat, t)}
    assert want <= set(cand.tolist())
    assert len(cand) < len(texts)  # pruning actually pruned
