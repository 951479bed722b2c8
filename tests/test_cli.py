"""CLI surface: build / search / autocomplete / status / error paths."""

import json
import os
import subprocess
import sys

import pytest

from lighthouse_ray.corpus import write_corpus


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    corpus = str(d / "corpus.parquet")
    write_corpus(corpus, 150)
    idx = str(d / "index")
    out = _run(
        "build", "--source", corpus, "--index", idx,
        "--parts", "4", "--shards", "8", "--num-cpus", "4",
    )
    info = json.loads(out.strip().splitlines()[-1])
    assert info["n_docs"] > 0
    return idx


def _run(*args):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, "-m", "lighthouse_ray", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r.returncode in (0, 2), r.stderr[-2000:]
    return r.stdout if r.returncode == 0 else r.stderr

def test_cli_search(cli_index):
    out = _run("search", "--index", cli_index, "-s", "interesting and amazing facts", "--size", "3")
    rows = json.loads(out.strip().splitlines()[-1])
    assert rows and {"name", "claimId", "score"} <= set(rows[0])


def test_cli_autocomplete_and_status(cli_index):
    names = json.loads(_run("autocomplete", "--index", cli_index, "-s", "fil").strip().splitlines()[-1])
    assert isinstance(names, list)
    st = json.loads(_run("status", "--index", cli_index).strip().splitlines()[-1])
    assert st["count"] > 0


def test_cli_validation_error(cli_index):
    err = _run("search", "--index", cli_index, "-s", "ab")
    assert "error" in json.loads(err.strip().splitlines()[-1])


def test_ray_job_entrypoint_and_resume(tmp_path):
    """The north-rule launch path: scripts/ray_job_entrypoint.py runs as
    a `ray job submit` entrypoint (here standalone -> local mode),
    builds a real index, prints JSON metrics, and a --resume re-submit
    skips the completed stages (same manifest machinery as mid-stage
    resume)."""
    corpus = str(tmp_path / "corpus.parquet")
    write_corpus(corpus, 120)
    idx = str(tmp_path / "jobidx")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # address="auto" must fall back to local

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "scripts/ray_job_entrypoint.py",
             "--source", corpus, "--index", idx,
             "--parts", "4", "--shards", "8", *extra],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    first = run()
    # the generator includes upsert duplicates; last-write-wins dedups
    assert 0 < first["n_docs"] <= 120 and first["n_postings"] > 0
    assert os.path.exists(os.path.join(idx, "stats.json"))

    resumed = run("--resume")
    assert resumed["n_docs"] == first["n_docs"]
    assert resumed["n_postings"] == first["n_postings"]
    # resume skipped the build stages: much faster than the cold run
    assert resumed["sec"] < first["sec"]
