"""Product-quantization ANN (functions/pq.py): determinism across
layouts, code-table shape, and retrieval quality vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from lighthouse_ray.functions.clustering import _quantize
from lighthouse_ray.functions.pq import pq_adc_topk, pq_encode, pq_fit

SF = "/root/testdata/sf0.01"


def _emb_ds(n_blocks=1):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).repartition(n_blocks)


def _emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    return ids, mat


def test_fit_deterministic_across_layouts(ray_session):
    b1 = pq_fit(_emb_ds(1), m=4, n_codes=8, iters=2)
    b8 = pq_fit(_emb_ds(8), m=4, n_codes=8, iters=2)
    assert b1.shape == (4, 8, 16)
    assert np.array_equal(b1, b8)


def test_encode_shape_and_determinism(ray_session):
    books = pq_fit(_emb_ds(4), m=4, n_codes=8, iters=2)
    codes = pq_encode(_emb_ds(4), books).to_pandas().sort_values("vec_id")
    assert len(codes) == 500
    lens = codes["codes"].map(len)
    assert (lens == 4).all()
    flat = np.stack(codes["codes"].to_numpy())
    assert flat.min() >= 0 and flat.max() < 8


def test_adc_recall_vs_brute_force(ray_session):
    """PQ is approximate; assert a recall floor against the exact
    maximum-inner-product ground truth (the operator's declared
    metric).  The synthetic embeddings are near-uniform (the hardest
    PQ regime — no cluster structure to exploit), so fine subspaces
    (m=32, dsub=2) are the right binding; the whole pipeline is
    deterministic, so the measured recall (0.7 mean) is a constant."""
    ids, mat = _emb_np()
    books = pq_fit(_emb_ds(4), m=32, n_codes=16, iters=3)
    recalls = []
    for qid in [0, 17, 101]:
        q = mat[ids == qid][0]
        qq = _quantize(q[None, :], 1000, 1000)[0]
        got = pq_adc_topk(_emb_ds(4), books, qq, k=10)
        ip = mat @ q  # exact inner-product ground truth
        true10 = set(ids[np.lexsort((ids, -ip))[:10]].tolist())
        hit = len(true10 & set(got["vec_id"].tolist()))
        recalls.append(hit / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_adc_topk_parallelism_invariant(ray_session):
    ids, mat = _emb_np()
    books = pq_fit(_emb_ds(2), m=4, n_codes=8, iters=2)
    qq = _quantize(mat[0][None, :], 1000, 1000)[0]
    a = pq_adc_topk(_emb_ds(1), books, qq, k=10)
    b = pq_adc_topk(_emb_ds(8), books, qq, k=10)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_ivfpq_full_probe_equals_flat_pq(ray_session):
    """IVFPQ with nprobe == n_clusters must return EXACTLY the flat PQ
    scan's ranking (PQ on raw vectors, not residuals — the invariant
    that makes the composition testable)."""
    from lighthouse_ray.functions.pq import ivfpq_index, ivfpq_topk

    ids, mat = _emb_np()
    idx = ivfpq_index(lambda: _emb_ds(4), n_clusters=4, m=4, n_codes=8)
    q = mat[ids == 7][0]
    qq = _quantize(q[None, :], 1000, 1000)[0]
    flat = pq_adc_topk(_emb_ds(4), idx.books, qq, k=10)
    full = ivfpq_topk(idx, q, k=10, nprobe=4)
    assert flat["vec_id"].tolist() == full["vec_id"].tolist()
    assert flat["score"].tolist() == full["score"].tolist()


def test_ivfpq_probe_reads_subset(ray_session):
    """nprobe < n_clusters returns a subset ranking (only probed
    buckets) and every returned id lives in a probed bucket."""
    import os

    from lighthouse_ray.functions.pq import ivfpq_index, ivfpq_topk

    ids, mat = _emb_np()
    idx = ivfpq_index(lambda: _emb_ds(4), n_clusters=8, m=4, n_codes=8)
    assert sum(len(v) for v in idx.bucket_files.values()) > 0
    q = mat[ids == 7][0]
    got = ivfpq_topk(idx, q, k=10, nprobe=2)
    assert 0 < len(got) <= 10
    # the flat scan at full probe must contain at least the probed top hit
    full = ivfpq_topk(idx, q, k=500, nprobe=8)
    assert got["vec_id"].iloc[0] in set(full["vec_id"])
    assert os.path.isdir(idx.root)
