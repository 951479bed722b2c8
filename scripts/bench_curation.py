"""Composed curation funnel at 878k docs — VERDICT round-2 item 6/8.

The LLM-pipeline headline run OFF toy scale: the near-dup family
composed end-to-end over a documents table derived from the 878k-doc
synthetic source-code corpus:

    minhash+LSH candidate pairs (exact-verified)
      -> connected components (alternating star rounds)
      -> near-dup removal (keep each cluster's min-id representative)
      -> per-lang funnel stats over the survivors

plus the exact-dedup aggregate on its own (the round-2 VERDICT asked
whether its sf0.1 1.57->1.83 s drift was real or fixed overhead —
this measures it at 878k rows).

Walls per stage, peak exchange scratch (sampled du of the spill
root), and the same-run host calibration are printed as ONE JSON
line.  Usage:

    python scripts/bench_curation.py [n_docs]   # default 1000000 (~878k live)

Env: RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
XCHG_ROOT = "/tmp/lighthouse_ray_xchg"


def _du(path: str) -> int:
    total = 0
    for r, _d, fs in os.walk(path):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


class ScratchSampler:
    """Background thread sampling the exchange spill root's size."""

    def __init__(self, path: str, interval: float = 0.5):
        self.path, self.interval, self.peak = path, interval, 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _du(self.path))
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()
        self.peak = max(self.peak, _du(self.path))


def big_documents_dir(n_docs: int) -> str:
    """documents-schema table (doc_id,text,lang,source,n_chars) derived
    deterministically from the synthetic code corpus, cached in /tmp."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bench import corpus_dir
    from lighthouse_ray.corpus import CORPUS_VERSION

    # v2u: doc_id hashes the CONTENT as well — the corpus deliberately
    # reuses (repo, path, commit) across different rows (README.md
    # rows share the logical key), and a documents table with one
    # doc_id -> many texts makes per-doc stats ill-defined (verified:
    # it made verified-pair jaccards depend on partition layout)
    out = f"/tmp/lighthouse_bigdocs_v{CORPUS_VERSION}u_d{n_docs}"
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    src = corpus_dir(n_docs)

    def to_docs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.empty(b.num_rows, dtype=np.int64)
        repo = b["repo"].to_pylist()
        path = b["path"].to_pylist()
        commit = b["commit"].to_pylist()
        content = b["content"].to_pylist()
        for i in range(b.num_rows):
            h = hashlib.sha1(
                f"{repo[i]}\0{path[i]}\0{commit[i]}\0".encode()
                + content[i].encode()
            ).digest()
            ids[i] = int.from_bytes(h[:8], "big") >> 1  # nonneg int63
        return pa.table({
            "doc_id": pa.array(ids),
            "text": b["content"],
            "lang": b["lang"],
            "source": b["repo"],
            "n_chars": pc.utf8_length(b["content"]).cast(pa.int64()),
        })

    # a DIRECTORY named documents.parquet: readable both as the gate
    # convention (<dir>/documents.parquet) and as partitioned output
    rd.read_parquet(src).map_batches(to_docs, batch_format="pyarrow").write_parquet(
        os.path.join(out, "documents.parquet")
    )
    open(marker, "w").write("ok")
    return out


def main() -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    docs_dir = big_documents_dir(n_docs)
    results: dict = {"n_input_docs": rd.read_parquet(os.path.join(docs_dir, "documents.parquet")).count()}

    # ---- exact dedup aggregate on its own (VERDICT item 8) ----
    from lighthouse_ray.pipelines.driver_queries import q_exact_dedup

    t0 = time.time()
    n = q_exact_dedup(docs_dir).count()
    results["exact_dedup_sec"] = round(time.time() - t0, 2)
    results["exact_dedup_rows"] = int(n)

    # ---- composed funnel: minhash -> CC -> keep -> per-lang stats ----
    from lighthouse_ray.functions.dedup import connected_components, minhash_dedup_pairs

    with ScratchSampler(XCHG_ROOT) as samp:
        t0 = time.time()
        # num_parts scales with corpus (spill_exchange contract: a few x
        # total cores at scale) — 128 parts balance the sketch-filter
        # reduce across 32 cores; the hottest single band-bucket run is
        # the irreducible tail (~10 s)
        pairs = minhash_dedup_pairs(
            rd.read_parquet(os.path.join(docs_dir, "documents.parquet"), columns=["doc_id", "text"]),
            threshold=0.5, k=3, num_parts=128,
        ).materialize()
        results["minhash_pairs_sec"] = round(time.time() - t0, 2)
        results["minhash_pairs"] = pairs.count()

        t0 = time.time()
        edges = pairs.map_batches(
            lambda b: b.select(["a", "b"]), batch_format="pyarrow"
        )
        nodes = rd.read_parquet(os.path.join(docs_dir, "documents.parquet"), columns=["doc_id"]).map_batches(
            lambda b: pa.table({"id": b["doc_id"]}), batch_format="pyarrow"
        )
        cc = connected_components(edges, nodes).materialize()
        results["cc_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        kept = cc.map_batches(
            lambda b: pa.table(
                {"doc_id": b.filter(pc.equal(b["id"], b["cluster"]))["id"]}
            ),
            batch_format="pyarrow",
        ).materialize()
        results["dedup_keep_sec"] = round(time.time() - t0, 2)
        results["kept_docs"] = kept.count()

        # funnel stats: per-lang (n_docs, n_tokens) of the survivors —
        # the survivor ids ride as a broadcast bloom-free filter (the
        # removed set is pair-graph-sized, far smaller than the corpus)
        t0 = time.time()
        removed = cc.map_batches(
            lambda b: pa.table(
                {"doc_id": b.filter(pc.invert(pc.equal(b["id"], b["cluster"])))["id"]}
            ),
            batch_format="pyarrow",
        ).to_pandas()
        import numpy as np

        removed_ref = ray.put(np.sort(removed["doc_id"].to_numpy()))
        from ray.data.aggregate import Count, Sum

        from lighthouse_ray.analysis import flat_tokens

        def stats(b: pa.Table, _r=removed_ref) -> pa.Table:
            import ray as _ray

            rem = _ray.get(_r)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.isin(ids, rem, invert=True)
            sel = b.filter(pa.array(keep))
            parents, _pos, _terms, nn = flat_tokens(sel["text"])
            cnt = np.bincount(parents, minlength=nn)
            return pa.table({
                "lang": sel["lang"],
                "n_tokens": pa.array(cnt.astype(np.int64)),
            })

        funnel = (
            rd.read_parquet(os.path.join(docs_dir, "documents.parquet"), columns=["doc_id", "text", "lang"])
            .map_batches(stats, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(), Sum("n_tokens", alias_name="n_tokens"))
            .to_pandas()
        )
        results["funnel_sec"] = round(time.time() - t0, 2)
        results["funnel_langs"] = len(funnel)
        results["funnel_docs"] = int(funnel["count()"].sum())

    results["peak_scratch_mb"] = round(samp.peak / 2**20, 1)
    results["composed_total_sec"] = round(
        results["minhash_pairs_sec"] + results["cc_sec"]
        + results["dedup_keep_sec"] + results["funnel_sec"], 2,
    )

    # same-run host calibration (bench.py convention)
    import multiprocessing as mp

    from bench import _calibration_task

    with mp.Pool(16) as pool:
        t0 = time.time()
        pool.map(_calibration_task, range(48))
        results["calibration_tasks_per_sec_16w"] = round(48 / (time.time() - t0), 1)

    results["num_cpus"] = NUM_CPUS
    return results


if __name__ == "__main__":
    out = main()
    import ray

    ray.shutdown()
    print(json.dumps(out))
