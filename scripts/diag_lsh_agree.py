"""Diagnostic 2: signature-agreement distribution of within-bucket pairs.

Measures, over the biggest LSH band-buckets at n_docs, the estimated
Jaccard (fraction of agreeing minhash values, 64 perms) of candidate
pairs — to pick the bucket_reduce pre-filter cutoff: how much junk a
cutoff of est_j >= 0.25 (16/64) removes, and how many survivors reach
exact verification.

Usage: python scripts/diag_lsh_agree.py [n_docs]
"""
from __future__ import annotations

import json
import os
import sys

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
            return pa.table({"bkey": pa.array([], type=pa.uint64()),
                             "sig": pa.array([], type=pa.binary())})
        sigs = np.asarray(sigt["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        nonempty = ~(sigs == np.iinfo(np.uint64).max).all(axis=1)
        bh = _band_hashes(sigs.astype(np.uint64), bands)
        sel = np.flatnonzero(nonempty)
        bk = bh[sel] ^ (np.arange(bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        sig8 = (sigs[sel] & 0xFF).astype(np.uint8)  # 1 byte per perm
        return pa.table({
            "bkey": pa.array(bk.reshape(-1)),
            "sig": pa.array(np.repeat(sig8, bands, axis=0).tobytes(), type=pa.binary())
            if False else pa.array(
                [s.tobytes() for s in np.repeat(sig8, bands, axis=0)], type=pa.binary()),
        })

    t = (
        rd.read_parquet(os.path.join(docs_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .to_pandas()
    )
    keys = t["bkey"].to_numpy()
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    sigs = np.frombuffer(b"".join(t["sig"].to_numpy()[order]), dtype=np.uint8).reshape(-1, 64)

    starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
    lens = np.diff(np.append(starts, len(keys)))

    rng = np.random.RandomState(7)
    # sample pairs from runs of each size class
    out = {"n_docs": n_docs}
    hist_total = np.zeros(65, dtype=np.int64)
    n_sampled = 0
    big = np.argsort(lens)[-20:]
    for ri in big:
        s, L = starts[ri], lens[ri]
        m = min(200_000, L * (L - 1) // 2)
        ii = rng.randint(0, L, size=m)
        jj = rng.randint(0, L, size=m)
        ok = ii != jj
        a = sigs[s + ii[ok]]
        b = sigs[s + jj[ok]]
        agree = (a == b).sum(axis=1)
        hist_total += np.bincount(agree, minlength=65)
        n_sampled += ok.sum()
    out["hot_bucket_pairs_sampled"] = int(n_sampled)
    out["agree_hist_hot"] = {int(i): int(c) for i, c in enumerate(hist_total) if c}
    out["hot_frac_ge16"] = round(float(hist_total[16:].sum() / max(1, n_sampled)), 5)
    out["hot_frac_ge24"] = round(float(hist_total[24:].sum() / max(1, n_sampled)), 5)
    out["hot_frac_ge32"] = round(float(hist_total[32:].sum() / max(1, n_sampled)), 5)

    # all runs with 2 <= L <= 50: exhaustive pair agreement (vectorized chunks)
    small = np.flatnonzero((lens >= 2) & (lens <= 50))
    hist_small = np.zeros(65, dtype=np.int64)
    cnt = 0
    for ri in small[:40_000]:
        s, L = starts[ri], lens[ri]
        blk = sigs[s:s + L]
        ag = (blk[:, None, :] == blk[None, :, :]).sum(2)
        iu = np.triu_indices(L, 1)
        hist_small += np.bincount(ag[iu], minlength=65)
        cnt += len(iu[0])
    out["small_bucket_pairs"] = int(cnt)
    out["small_frac_ge16"] = round(float(hist_small[16:].sum() / max(1, cnt)), 5)
    out["small_frac_ge32"] = round(float(hist_small[32:].sum() / max(1, cnt)), 5)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
