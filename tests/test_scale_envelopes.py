"""Operator-level scale-envelope conformance (VERDICT r3 item 8).

SCALE.md claims per-op exchange-volume bounds; this harness checks them
empirically: each heavy dedup/clustering op runs at two input sizes
(documents: 500 rows at sf0.001 vs 5000 at sf0.1, a 10x step) with
exchange accounting on (LIGHTHOUSE_RAY_XCHG_ACCOUNTING), and the
shuffled-row growth factor must stay inside the op's envelope.  A
future regression re-introducing an all-pairs path would read ~100x
(quadratic) and trip the bound.

Envelopes (measured on the synthetic corpus, generous margin):
- linear ops (banded/bucketed by design): ~10x measured, bound 20x —
  minhash LSH candidates, paragraph chunk exchange, ExactSubstr
  occurrence exchange, incremental probe.
- pair-based shingle ops: ~31-37x measured (pair volume grows with
  within-bucket df^2, capped by the max_df hot-shingle guard),
  bound 60x — far below the ~100x an uncapped all-pairs path shows.

Run with: python -m pytest -m scale_envelope -q
"""

import json
import os
import tempfile

import pytest

from lighthouse_ray.pipelines import make_queries

SMALL = "/root/testdata/sf0.001"  # documents: 500 rows
LARGE = "/root/testdata/sf0.1"    # documents: 5000 rows (10x)

# op -> max allowed shuffled-row growth factor for the 10x input step
ENVELOPES = {
    "minhash_lsh": 20.0,
    "paragraph_dedup": 20.0,
    "substring_dup": 20.0,
    "substring_scrub": 20.0,
    "incremental_neardup": 20.0,
    "ngram_jaccard": 60.0,
    "containment_dup": 60.0,
    "winnow_dedup": 60.0,
    "dup_clusters": 60.0,
    "dedup_keep": 60.0,
    "knn_graph_srp": 20.0,   # N x bands exchange rows + <=k x bands partials
}


def _exchange_rows(fn, sf_dir: str) -> int:
    acct = tempfile.mktemp(suffix=".jsonl")
    os.environ["LIGHTHOUSE_RAY_XCHG_ACCOUNTING"] = acct
    try:
        out = fn(sf_dir)
        if hasattr(out, "to_pandas"):
            out.to_pandas()  # consume the pipeline
    finally:
        os.environ.pop("LIGHTHOUSE_RAY_XCHG_ACCOUNTING", None)
    if not os.path.exists(acct):
        return 0
    try:
        return sum(json.loads(line)["rows"] for line in open(acct))
    finally:
        os.remove(acct)


@pytest.mark.scale_envelope
@pytest.mark.parametrize("op", sorted(ENVELOPES))
def test_exchange_volume_grows_sub_quadratically(ray_session, op):
    fn = make_queries()[op]
    small = _exchange_rows(fn, SMALL)
    large = _exchange_rows(fn, LARGE)
    assert small > 0, f"{op}: no exchange recorded at {SMALL} — accounting broken?"
    factor = large / small
    bound = ENVELOPES[op]
    assert factor <= bound, (
        f"{op}: exchange volume grew {factor:.1f}x for a 10x input "
        f"(bound {bound}x; quadratic would be ~100x) — "
        f"{small} -> {large} shuffled rows"
    )


def _clustered_vecs(n: int, cluster: int = 12, dim: int = 32, seed: int = 7):
    """Planted high-cosine clusters + per-vector jitter: every vector's
    true >=tau neighbors are its cluster mates."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n_clusters = n // cluster
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = np.repeat(centers, cluster, axis=0)[:n]
    vecs = base + 0.12 * rng.standard_normal((n, dim))
    return vecs


@pytest.mark.scale_envelope
def test_knn_srp_candidate_volume_subquadratic(ray_session):
    """VERDICT r4 item 2 ('envelope test asserting sub-quadratic
    block-pair growth'): on clustered data, with planes-per-band scaled
    ~log2(N), the candidate-pair volume knn_graph_srp evaluates grows
    FAR slower than the exact path's N^2/2 — a 4x input must not grow
    candidates 16x (quadratic); bound 6x."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lighthouse_ray.functions.similarity import srp_candidate_volume

    def ds_of(vecs):
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), vecs.shape[1]),
        })
        return rd.from_arrow(t)

    n = 1200
    small = srp_candidate_volume(ds_of(_clustered_vecs(n)),
                                 num_planes=144, bands=24)      # r=6
    large = srp_candidate_volume(ds_of(_clustered_vecs(4 * n)),
                                 num_planes=192, bands=24)      # r=8
    assert small > 0
    factor = large / small
    assert factor <= 6.0, (
        f"SRP candidate volume grew {factor:.1f}x for a 4x input "
        f"(quadratic would be 16x) — {small} -> {large} pairs"
    )
    # and the prune is real: candidates are a small fraction of N^2/2
    exact_pairs = (4 * n) * (4 * n - 1) / 2
    assert large < 0.25 * exact_pairs, (
        f"no real prune: {large} candidates vs {exact_pairs:.0f} exact pairs")
