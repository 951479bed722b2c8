"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: numpy matmul per batch
  against a broadcast (``ray.put``) query matrix; the baseline and the
  oracle-checked path (pipelines/driver_queries.py ann_cosine_topk).
- :func:`ivf_index` / :func:`ivf_topk` — IVF scale path: deterministic
  k-means coarse quantizer, rows bucketed by nearest centroid
  (``groupby``-free: bucket id is a pure function of the vector), query
  probes the ``nprobe`` nearest buckets only.  Recall is validated
  against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    emb = batch[vec_col].combine_chunks()
    flat = np.asarray(emb.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for one or more query vectors.

    Returns a Dataset of (query_idx, vec_id, cos) — per-batch scores via
    one matmul, global top-k via sort+limit per query (k small).
    """
    import ray

    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(q)

    class Score:
        def __init__(self, ref):
            import ray as _r

            self.q = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _to_matrix(batch, vec_col)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cos = m @ self.q.T  # (rows, nq)
            nq = cos.shape[1]
            ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), nq)
            qidx = np.tile(np.arange(nq, dtype=np.int32), batch.num_rows)
            return pa.table(
                {
                    "query_idx": pa.array(qidx),
                    id_col: pa.array(ids),
                    "cos": pa.array(np.round(cos.reshape(-1), 6)),
                }
            )

    scored = ds.map_batches(Score, fn_constructor_kwargs={"ref": qref},
                            batch_format="pyarrow", concurrency=(1, 4))
    return scored.sort(["query_idx", "cos", id_col], descending=[False, True, False]).limit(
        k * len(q)
    )


def kmeans_centroids(mat: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on the (small, driver-side) sample."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            sel = assign == c
            if sel.any():
                cent[c] = mat[sel].mean(axis=0)
    return cent


class IvfIndex:
    """Coarse quantizer + bucketed vectors held in the object store."""

    def __init__(self, centroids: np.ndarray, bucket_refs: dict[int, object]):
        self.centroids = centroids
        self.bucket_refs = bucket_refs


def ivf_index(ds, n_clusters: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", sample_rows: int = 10_000) -> IvfIndex:
    """Train the coarse quantizer on a driver-side sample, then bucket
    all rows by nearest centroid with a map_batches pass; each bucket is
    ``ray.put`` as a (ids, matrix) pair.  At scale buckets would be
    parquet partitions (one dir per centroid) instead of plasma objects.
    """
    import ray

    sample = ds.limit(sample_rows).to_pandas()
    mat = np.stack(sample[vec_col].to_numpy())
    cent = kmeans_centroids(mat.astype(np.float64), n_clusters)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _r

        c = _r.get(cref)
        m = _to_matrix(batch, vec_col)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("bucket", pa.array(d.argmin(axis=1).astype(np.int32)))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    buckets: dict[int, list] = {}
    for b in assigned.iter_batches(batch_format="pyarrow"):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b, vec_col)
        for bk in np.unique(b["bucket"].to_numpy(zero_copy_only=False)):
            sel = b["bucket"].to_numpy(zero_copy_only=False) == bk
            buckets.setdefault(int(bk), []).append((ids[sel], m[sel]))
    import ray as _r

    refs = {}
    for bk, parts in buckets.items():
        ids = np.concatenate([p[0] for p in parts])
        m = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids)
        refs[bk] = _r.put((ids[order], m[order]))
    return IvfIndex(cent, refs)


def ivf_topk(index: IvfIndex, query_vec: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """Probe the nprobe nearest buckets; exact cosine within them."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    d = ((index.centroids - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(d)[:nprobe]
    ids_all, cos_all = [], []
    for bk in probe:
        ref = index.bucket_refs.get(int(bk))
        if ref is None:
            continue
        ids, m = ray.get(ref)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids_all.append(ids)
        cos_all.append(mn @ qn)
    if not ids_all:
        return pd.DataFrame({"vec_id": [], "cos": []})
    ids = np.concatenate(ids_all)
    cos = np.concatenate(cos_all)
    order = np.lexsort((ids, -cos))[:k]
    return pd.DataFrame({"vec_id": ids[order], "cos": np.round(cos[order], 6)})
