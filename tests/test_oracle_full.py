"""One-command full oracle sweep (VERDICT r3 item 3).

The external driver samples 50 of the registry's gates per round; this
marked test runs ALL of them against their DuckDB oracles so a local
`python -m pytest -m oracle_full -q` proves the whole registry green
regardless of which subset the driver samples.

Runs in a subprocess because the checker owns its own Ray session
(`ray.init`/`ray.shutdown`), which must not collide with the pytest
session-scoped Ray fixture.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.oracle_full
def test_all_driver_gates_sf001():
    env = dict(os.environ)
    env.pop("ONLY", None)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "check_driver_queries.py"),
            "/root/testdata/sf0.01",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    sys.stdout.write(r.stdout[-6000:])
    assert r.returncode == 0, r.stdout[-6000:] + r.stderr[-2000:]
