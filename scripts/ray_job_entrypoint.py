"""Cluster entrypoint for `ray job submit` (north_rule launch path).

On a real fixed-size cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/ray_job_entrypoint.py \
             --source s3://bucket/corpus/ --index /mnt/shared/index \
             --parts 65536 --shards 131072 [--resume]

Inside a Ray Job the cluster is already initialised, so
``ray.init(address="auto")`` attaches to it; partition counts are
content-addressed config (never derived from cluster size), so the same
job on N or 4N nodes produces byte-identical segments
(scripts/check_determinism.py is the single-machine evidence).
Re-submitting with --resume skips completed stages/shards via the
per-partition manifest.

In this sandbox the same entrypoint runs against local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--parts", type=int, default=64)
    p.add_argument("--shards", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` this attaches to the running cluster;
        # standalone it starts local mode
        ray.init(address="auto", ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lighthouse_ray.build import build_index
    from lighthouse_ray.config import IndexConfig

    t0 = time.time()
    res = build_index(
        args.source,
        args.index,
        IndexConfig(num_doc_parts=args.parts, num_term_shards=args.shards),
        resume=args.resume,
    )
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs": res.n_docs,
                "n_postings": res.n_postings,
                "sec": round(dt, 2),
                "docs_per_sec": round(res.n_docs / dt, 1),
                "index": res.index_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
