"""Cron sync daemon at 878k docs — the S6b scale row.

Initial full sync (one bootstrap batch -> base index build), then an
incremental tick: 5,000 upserts + 500 deletes pulled by the watermark
filter in reference-sized keyset batches (1,000/batch,
chainquery.go:102) and applied as deltas, then the compaction policy
evaluated and (forced) a compaction — wall per phase, tick cost vs
corpus size, query p50 on the delta chain vs post-compaction.

The source-of-truth table is built out-of-core with DuckDB (row_number
ids over the deterministic corpus order), so nothing corpus-sized
touches the driver.

Usage: python scripts/bench_sync_daemon.py [n_docs]   # default 1_000_000
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_CHANGED, N_DELETED = 5000, 500


def main() -> dict:
    import duckdb
    import ray

    from bench import corpus_dir
    from lighthouse_ray.config import IndexConfig
    from lighthouse_ray.state import SyncDaemon

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    src_corpus = corpus_dir(n_docs)
    work = "/tmp/lighthouse_sync_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    source = os.path.join(work, "source.parquet")

    con = duckdb.connect()
    # v1: every corpus row at t=1000 (DISTINCT logical keys — the source
    # table is versioned by id, so each id must be one version)
    con.execute(f"""
      COPY (
        SELECT repo, path, commit, lang, content,
               row_number() OVER (ORDER BY repo, path, commit, content) AS id,
               CAST(1000 AS BIGINT) AS modified_at, false AS deleted
        FROM (
          SELECT * FROM read_parquet('{src_corpus}/*.parquet')
          QUALIFY row_number() OVER (PARTITION BY repo, path
                                     ORDER BY commit DESC, content DESC) = 1
        )
      ) TO '{source}' (FORMAT parquet)
    """)
    n_src = con.execute(f"SELECT count(*) FROM read_parquet('{source}')").fetchone()[0]

    results: dict = {"n_source_rows": int(n_src), "num_cpus": NUM_CPUS}
    cfg = IndexConfig(num_doc_parts=32, num_term_shards=64)
    delta_cfg = IndexConfig(num_doc_parts=4, num_term_shards=8)

    # ---- initial full sync: one bootstrap batch -> base build ------------
    daemon = SyncDaemon(work + "/w", source, cfg=cfg, delta_cfg=delta_cfg,
                        batch_size=n_src + 1)
    t0 = time.time()
    r1 = daemon.cycle(now=1500)
    results["initial_sync_sec"] = round(time.time() - t0, 1)
    results["initial_upserts"] = r1["upserts"]

    # ---- v2: incremental wave (5k upserts + 500 deletes) -----------------
    con.execute(f"""
      COPY (
        SELECT * FROM read_parquet('{source}')
        UNION ALL
        SELECT repo, path, commit, 'python' AS lang,
               content || ' zebrastripe_incremental_marker' AS content,
               id + {n_src} AS id, CAST(2000 AS BIGINT) AS modified_at,
               (id % {N_CHANGED + N_DELETED}) < {N_DELETED} AS deleted
        FROM read_parquet('{source}')
        WHERE id <= {N_CHANGED + N_DELETED}
      ) TO '{work}/source2.parquet' (FORMAT parquet)
    """)
    daemon2 = SyncDaemon(work + "/w", work + "/source2.parquet", cfg=cfg,
                         delta_cfg=delta_cfg, batch_size=1000,
                         compact_max_deltas=10**9, compact_max_delta_frac=1e9)
    t0 = time.time()
    r2 = daemon2.cycle(now=2500)
    results["tick_sec"] = round(time.time() - t0, 1)
    results["tick_batches"] = r2["batches"]
    results["tick_upserts"] = r2["upserts"]
    results["tick_deletes"] = r2["deletes"]

    # ---- query p50 on the delta chain ------------------------------------
    def p50(idx, n=9):
        lat = []
        for _ in range(n):
            t = time.time()
            idx.search_topk("content", ["zebrastripe", "incremental", "marker"], k=10)
            lat.append(time.time() - t)
        return round(1000 * statistics.median(lat), 1)

    daemon2.index.search_topk("content", ["warm"], k=1)  # warm readers
    results["query_p50_ms_delta_chain"] = p50(daemon2.index)
    results["n_deltas"] = len(daemon2.index.state["deltas"])

    # ---- minor compaction: fold the 6-delta chain in place ---------------
    t0 = time.time()
    minfo = daemon2.index.minor_compact(delta_cfg)
    results["minor_compact_sec"] = round(time.time() - t0, 1)
    results["minor_merged_docs"] = minfo["merged_docs"]
    results["minor_tombstones"] = minfo["tombstones"]
    daemon2.index.search_topk("content", ["warm"], k=1)
    results["query_p50_ms_after_minor"] = p50(daemon2.index)

    # ---- forced MAJOR compaction -----------------------------------------
    t0 = time.time()
    compacted = daemon2.index.compact(work + "/compacted", cfg)
    results["compact_sec"] = round(time.time() - t0, 1)
    compacted.search_topk("content", ["warm"], k=1)
    results["query_p50_ms_compacted"] = p50(compacted)

    import multiprocessing as mp

    from bench import _calibration_task

    with mp.Pool(16) as pool:
        t0 = time.time()
        pool.map(_calibration_task, range(48))
        results["calibration_tasks_per_sec_16w"] = round(48 / (time.time() - t0), 1)
    return results


if __name__ == "__main__":
    out = main()
    import ray

    ray.shutdown()
    print(json.dumps(out))
