"""Object-spilling determinism check: the build must stream correctly
under object-store memory pressure.

Builds the SAME corpus twice in fresh processes — once with a normal
object store, once with a deliberately tiny one (forcing Ray to spill
objects to disk mid-pipeline) — and asserts the resulting segments are
byte-identical (per-shard sha256 from the build manifests).  This is
the single-box stand-in for "a 256-node cluster streaming 100 TB
through the object store": block sizes and partition counts are config,
so memory pressure may change WHEN blocks spill but never WHAT the
stages compute.

    python scripts/check_spill_pressure.py [n_docs] [store_mb]

Defaults: 200,000 docs, 300 MB object store for the constrained leg
(vs. Ray's default ~30% of RAM).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import json, sys, time
import ray
store = int(sys.argv[1])
corpus, index = sys.argv[2], sys.argv[3]
kw = dict(address="local", num_cpus=16, include_dashboard=False,
          logging_level="ERROR")
if store:
    kw["object_store_memory"] = store
ray.init(**kw)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, ".")
from lighthouse_ray.build import build_index
from lighthouse_ray.config import IndexConfig
t0 = time.time()
res = build_index(corpus, index,
                  IndexConfig(num_doc_parts=16, num_term_shards=32))
shas = {k: v["sha256"]
        for k, v in res.manifest["stages"]["segments"]["shards"].items()}
print(json.dumps({"sec": round(time.time() - t0, 2),
                  "n_docs": res.n_docs, "shas": shas}))
ray.shutdown()
"""


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    store_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import corpus_dir  # deterministic cached corpus

    corpus = corpus_dir(n_docs)
    ray.shutdown()

    def run(store_bytes: int, index: str) -> dict:
        env = dict(os.environ)
        env.pop("RAY_ADDRESS", None)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, str(store_bytes), corpus, index],
            capture_output=True, text=True, timeout=3600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            raise SystemExit(2)
        return json.loads(r.stdout.strip().splitlines()[-1])

    t = int(time.time())
    normal = run(0, f"/tmp/lighthouse_spillchk_{t}_normal")
    tight = run(store_mb << 20, f"/tmp/lighthouse_spillchk_{t}_tight")

    same = normal["shas"] == tight["shas"]
    print(json.dumps({
        "metric": "spill_pressure_determinism",
        "identical_segments": same,
        "n_shards": len(normal["shas"]),
        "n_docs": normal["n_docs"],
        "store_mb_tight": store_mb,
        "sec_normal": normal["sec"],
        "sec_tight": tight["sec"],
    }))
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
