"""Delta/compaction policy measurement at 878k docs — VERDICT round-2 item 7.

Measures, on the 878k-live-doc synthetic corpus:

- base build wall (the canonical index),
- per-delta apply wall (5k-doc upsert batches at a delta-sized layout),
- merged search_topk p50/p95 as a function of live delta segments
  (0, 1, 2, 4, 8) — including the one-off live-map rebuild each sync
  causes and the steady-state per-query cost,
- compaction wall (rebuild one canonical index from the live set) and
  post-compaction p50.

The output backs the compaction TRIGGER recorded in BASELINE.md:
compact when steady-state p50 over the delta chain exceeds ~2x the
single-segment p50, or on a delta-count cap, whichever first.

Usage: python scripts/bench_compaction.py [n_corpus_rows]   # default 1000000
Env: RAY_GRAFT_CPUS (default 32).  Prints ONE JSON line.
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
ROOT = "/tmp/lighthouse_bench_compaction"
DELTA_DOCS = 5_000
N_DELTAS = 8
MEASURE_AT = (0, 1, 2, 4, 8)

QUERY_TERMS = [
    ["interesting", "amazing", "facts"],
    ["merge", "segment", "index"],
    ["import"],
    ["buffer", "flush"],
    ["http", "response", "parse"],
]


def _p50_p95(inc, reps: int = 5) -> tuple[float, float]:
    lat = []
    for _ in range(reps):
        for terms in QUERY_TERMS:
            t0 = time.time()
            inc.search_topk("content", terms, k=10)
            lat.append(time.time() - t0)
    return (
        round(statistics.median(lat), 4),
        round(sorted(lat)[int(len(lat) * 0.95)], 4),
    )


def main() -> dict:
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bench import corpus_dir
    from lighthouse_ray.config import IndexConfig
    from lighthouse_ray.state.incremental import IncrementalIndex

    src = corpus_dir(n_rows)
    results: dict = {"n_corpus_rows": n_rows}

    shutil.rmtree(ROOT, ignore_errors=True)
    inc = IncrementalIndex(ROOT, IndexConfig(num_doc_parts=64, num_term_shards=128))

    t0 = time.time()
    inc.build_base(src)
    results["base_build_sec"] = round(time.time() - t0, 2)
    results["n_live_docs"] = int(sum(m.sum() for m in inc.live_map()))

    # delta batches: existing logical keys with modified content (pure
    # upsert-shadowing, the common case); one slice per delta from the
    # first corpus file
    first_file = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )[0]
    head = pq.read_table(os.path.join(src, first_file))
    delta_docs = min(DELTA_DOCS, head.num_rows // N_DELTAS)
    results["delta_docs"] = delta_docs

    delta_cfg = IndexConfig(num_doc_parts=4, num_term_shards=8)
    p50_by_deltas: dict[str, dict] = {}
    p50, p95 = _p50_p95(inc)
    p50_by_deltas["0"] = {"p50_ms": round(p50 * 1000, 1), "p95_ms": round(p95 * 1000, 1)}

    for d in range(N_DELTAS):
        lo = d * delta_docs
        sl = head.slice(lo, delta_docs)
        import pyarrow as pa
        import pyarrow.compute as pc

        sl = sl.set_column(
            sl.schema.get_field_index("content"), "content",
            pc.binary_join_element_wise(
                sl["content"].cast(pa.string()), f"deltatoken{d}", " "
            ),
        )
        t0 = time.time()
        inc.apply_delta(rd.from_arrow(sl), cfg=delta_cfg)
        apply_sec = time.time() - t0
        t0 = time.time()
        inc.live_map()  # the one-off per-sync cost, isolated
        livemap_sec = time.time() - t0
        if (d + 1) in MEASURE_AT:
            p50, p95 = _p50_p95(inc)
            p50_by_deltas[str(d + 1)] = {
                "p50_ms": round(p50 * 1000, 1),
                "p95_ms": round(p95 * 1000, 1),
                "apply_delta_sec": round(apply_sec, 2),
                "livemap_rebuild_sec": round(livemap_sec, 2),
            }

    results["search_by_live_deltas"] = p50_by_deltas

    # compaction: one canonical index from the live set
    t0 = time.time()
    compacted = inc.compact(ROOT + "_compacted")
    results["compact_sec"] = round(time.time() - t0, 2)
    p50, p95 = _p50_p95(compacted)
    results["post_compact_p50_ms"] = round(p50 * 1000, 1)
    results["post_compact_p95_ms"] = round(p95 * 1000, 1)
    results["n_live_after_compact"] = int(sum(m.sum() for m in compacted.live_map()))

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
