"""Diagnostic: LSH band-bucket size distribution at scale.

The 878k curation bench segfaulted inside bucket_reduce's pair
group_by; this measures whether hot band-buckets make the within-run
pair count L*(L-1)/2 explode.  Prints per-bucket-size histogram and
the implied total pair count.

Usage: python scripts/diag_lsh_buckets.py [n_docs]   # default 100000
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main():
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from scripts.bench_curation import big_documents_dir
    from lighthouse_ray.functions.dedup import minhash_signatures, _band_hashes

    docs_dir = big_documents_dir(n_docs)
    num_perm, bands, k = 64, 32, 3

    def explode(batch: pa.Table) -> pa.Table:
        sigt = minhash_signatures(batch, "text", "doc_id", num_perm, k)
        n = sigt.num_rows
        if n == 0:
            return pa.table({"bkey": pa.array([], type=pa.uint64())})
        sigs = np.asarray(sigt["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        nonempty = ~(sigs == np.iinfo(np.uint64).max).all(axis=1)
        bh = _band_hashes(sigs.astype(np.uint64), bands)
        sel = np.flatnonzero(nonempty)
        # fold band index into the bucket hash so each (band, bhash) is one key
        bk = bh[sel] ^ (np.arange(bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table({"bkey": pa.array(bk.reshape(-1))})

    t0 = time.time()
    keys = (
        rd.read_parquet(os.path.join(docs_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .to_pandas()["bkey"].to_numpy()
    )
    sig_sec = time.time() - t0
    u, counts = np.unique(keys, return_counts=True)
    hist_sizes, hist_n = np.unique(counts, return_counts=True)
    pairs = (counts.astype(np.float64) * (counts - 1) / 2).sum()
    top = np.sort(counts)[-10:][::-1]
    out = {
        "n_docs": n_docs,
        "n_bucket_entries": int(len(keys)),
        "n_buckets": int(len(u)),
        "total_within_bucket_pairs": int(pairs),
        "top10_bucket_sizes": top.tolist(),
        "bucket_size_hist_tail": {int(s): int(c) for s, c in zip(hist_sizes, hist_n) if s >= 2},
        "sig_sec": round(sig_sec, 1),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
