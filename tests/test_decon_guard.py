"""Decontamination broadcast-cap guard (VERDICT r3 item 5): the
"benchmark ≪ corpus" assumption is a checked invariant, not a comment.
An adversarially large benchmark set must fail loudly (pointing at the
partitioned probe path), never silently materialize on the driver."""

import pytest

from lighthouse_ray.pipelines import driver_queries as dq

SF = "/root/testdata/sf0.001"


def test_decontaminate_guard_trips_on_large_benchmark(ray_session, monkeypatch):
    monkeypatch.setattr(dq, "DECON_MAX_BENCH_SHINGLES", 3)
    with pytest.raises(ValueError, match="DECON_MAX_BENCH_SHINGLES"):
        dq.q_decontaminate(SF)


def test_decontaminate_passes_under_cap(ray_session):
    # default cap: the real gate path is unaffected
    out = dq.q_decontaminate(SF).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "n_overlap"}
