"""ExactSubstr scrub (functions/dedup.py::substring_scrub): duplicated
token ranges are cut, unique content survives, layout-invariant."""

import numpy as np
import pyarrow as pa

from lighthouse_ray.functions.dedup import substring_scrub

K = 3


def _corpus():
    shared = "alpha beta gamma delta"  # a 4-token run shared verbatim
    return pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            f"unique zero {shared} tail zero",
            f"{shared} unique one body",
            "totally distinct text body three",
        ]),
    })


def _run(n_blocks):
    import ray.data as rd

    return substring_scrub(
        lambda: rd.from_arrow(_corpus()).repartition(n_blocks), k=K
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_scrub_cuts_shared_run_keeps_unique(ray_session):
    out = _run(2)
    assert out["doc_id"].tolist() == [0, 1, 2]
    # the shared 4-token run is covered by dup 3-grams in docs 0 and 1
    assert out.loc[0, "n_cut"] == 4 and out.loc[1, "n_cut"] == 4
    assert out.loc[0, "text_clean"] == "unique zero tail zero"
    assert out.loc[1, "text_clean"] == "unique one body"
    # doc 2 shares nothing: byte-lossless (tokenized) text
    assert out.loc[2, "n_cut"] == 0
    assert out.loc[2, "text_clean"] == "totally distinct text body three"
    # conservation: kept tokens + cut == total
    got_kept = out["text_clean"].map(lambda t: len(t.split()) if t else 0)
    assert ((got_kept + out["n_cut"]) == out["n_tokens"]).all()


def test_scrub_layout_invariant(ray_session):
    a, b = _run(1), _run(3)
    assert a.equals(b)
