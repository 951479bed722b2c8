"""Graph operators (fixed-point PageRank, triangle count) and the
ordered-frame rolling window vs brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rand_edges(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def _pagerank_reference(src, dst, n_nodes, iters, scale=10**12, damping=85):
    """Dense single-process mirror of the fixed-point semantics."""
    outdeg = np.bincount(src, minlength=n_nodes).astype(np.int64)
    base = ((100 - damping) * scale) // (100 * n_nodes)
    rank = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    for _ in range(iters):
        contrib = rank[src] // outdeg[src]
        sums = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(sums, dst, contrib)
        rank = base + (damping * sums) // 100
    return rank


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 80, 300), (2, 50, 60), (3, 40, 800)])
def test_pagerank_vs_dense_reference(ray_session, seed, n_nodes, n_edges):
    import ray.data as rd

    from lighthouse_ray.functions.graph import pagerank

    rng = np.random.default_rng(seed)
    edges_t = _rand_edges(rng, n_nodes, n_edges)
    # keep self-loops out of the reference too (the operator treats the
    # edge list verbatim; self-loops are legal input for pagerank)
    nodes = rd.from_arrow(pa.table({"node": pa.array(np.arange(n_nodes), pa.int64())}))
    out = (
        pagerank(rd.from_arrow(edges_t), nodes, iters=3, num_parts=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _pagerank_reference(
        edges_t["src"].to_numpy(), edges_t["dst"].to_numpy(), n_nodes, iters=3
    )
    assert len(out) == n_nodes
    np.testing.assert_array_equal(out["rank"].to_numpy(), want)


def test_pagerank_isolated_and_dangling(ray_session):
    """Isolated nodes keep the teleport term; dangling mass is dropped
    (documented semantics)."""
    import ray.data as rd

    from lighthouse_ray.functions.graph import PR_SCALE, pagerank

    # 0 -> 1 -> 2 (2 dangling), 3 isolated
    edges = pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())}))
    out = pagerank(rd.from_arrow(edges), nodes, iters=2, num_parts=2).to_pandas()
    out = out.set_index("node")["rank"]
    base = (15 * PR_SCALE) // (100 * 4)
    assert out[0] == base  # no in-links: teleport only
    assert out[3] == base  # isolated: teleport only
    assert out[1] > base and out[2] > base
    want = _pagerank_reference(
        edges["src"].to_numpy(), edges["dst"].to_numpy(), 4, iters=2
    )
    np.testing.assert_array_equal(out.sort_index().to_numpy(), want)


@pytest.mark.parametrize("seed,n_nodes,p", [(1, 40, 0.15), (2, 25, 0.4), (3, 60, 0.05)])
def test_triangle_count_vs_adjacency(ray_session, seed, n_nodes, p):
    import ray.data as rd

    from lighthouse_ray.functions.graph import triangle_count

    rng = np.random.default_rng(seed)
    a = rng.random((n_nodes, n_nodes)) < p
    adj = np.triu(a, 1)  # undirected, no self-loops
    und = adj | adj.T
    want = int(np.trace(und.astype(np.int64) @ und @ und) // 6)
    # feed DIRECTED duplicated edges: the operator must canonicalize
    s, d = np.nonzero(adj)
    src = np.concatenate([s, d, s])  # both directions + dups
    dst = np.concatenate([d, s, d])
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    assert triangle_count(ds, num_parts=4) == want


def test_triangle_count_empty_and_tiny(ray_session):
    import ray.data as rd

    from lighthouse_ray.functions.graph import triangle_count

    tri = pa.table({"src": pa.array([0, 1, 2], pa.int64()), "dst": pa.array([1, 2, 0], pa.int64())})
    assert triangle_count(rd.from_arrow(tri), num_parts=2) == 1
    line = pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    assert triangle_count(rd.from_arrow(line), num_parts=2) == 0
    loops = pa.table({"src": pa.array([5, 5], pa.int64()), "dst": pa.array([5, 5], pa.int64())})
    assert triangle_count(rd.from_arrow(loops), num_parts=2) == 0


def test_rolling_user_agg_vs_pandas(ray_session):
    import ray.data as rd

    from lighthouse_ray.functions.windows import rolling_user_agg

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s"
            ),
            "value": np.round(rng.random(n) * 50, 2),
        }
    )
    # duplicate timestamps within a user exercise the event_id tie-break
    df.loc[1, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]]

    out = (
        rolling_user_agg(rd.from_pandas(df), window=3, num_parts=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    ref = df.copy()
    ref["cents"] = np.round(ref["value"].to_numpy() * 100).astype(np.int64)
    ref = ref.sort_values(["user_id", "ts", "event_id"])
    g = ref.groupby("user_id")["cents"]
    ref["running_total"] = g.cumsum().astype(np.float64) / 100.0
    rsum = g.rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    rcnt = g.rolling(3, min_periods=1).count().reset_index(level=0, drop=True)
    ref["rolling_mean"] = rsum.astype(np.float64) / rcnt / 100.0
    ref = ref.sort_values("event_id").reset_index(drop=True)

    np.testing.assert_array_equal(out["event_id"], ref["event_id"])
    np.testing.assert_allclose(out["running_total"], ref["running_total"], rtol=0, atol=0)
    np.testing.assert_allclose(out["rolling_mean"], ref["rolling_mean"], rtol=1e-15)


def test_triangle_degree_relabel_bounds_hub_wedges(ray_session):
    """VERDICT r4 item 6: a hot LOW-ID hub (star graph + a few leaf
    edges) generates deg^2/2 wedges under raw id ordering but ~zero
    under the degree relabel — both counts exact, wedge volume bounded."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lighthouse_ray.functions.graph import triangle_count

    n_leaves = 120
    # hub id 0 -> leaves 1..n; plus a ring edge between consecutive
    # leaves, giving exactly n_leaves triangles (hub, i, i+1) incl wrap
    src = [0] * n_leaves + list(range(1, n_leaves + 1))
    dst = list(range(1, n_leaves + 1)) + \
        [i % n_leaves + 1 for i in range(1, n_leaves + 1)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
    }))

    st_id, st_deg = {}, {}
    n_id = triangle_count(edges, degree_relabel=False, stats=st_id)
    n_deg = triangle_count(edges, degree_relabel=True, stats=st_deg)
    assert n_id == n_deg == n_leaves  # exactness unchanged
    # raw id order: hub (id 0) pairs all n_leaves higher neighbors
    assert st_id["wedge_rows"] >= n_leaves * (n_leaves - 1) // 2
    # degree order: hub ranks highest -> zero hub wedges; leaves have
    # deg 3, so per-center wedges <= C(3,2)=3 -> total <= 3*(n+1)
    assert st_deg["wedge_rows"] <= 3 * (n_leaves + 1)


def test_triangle_relabel_parity_random_graph(ray_session):
    """Both orderings agree with a brute-force count on a random graph
    with duplicate/reversed/self-loop edges thrown in."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lighthouse_ray.functions.graph import triangle_count

    rng = np.random.RandomState(17)
    m = 260
    src = rng.randint(0, 40, m)
    dst = rng.randint(0, 40, m)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
    }))
    adj = set()
    for s, d in zip(src, dst):
        if s != d:
            adj.add((min(s, d), max(s, d)))
    want = sum(
        1 for a, b, c in itertools.combinations(sorted({v for e in adj for v in e}), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    assert triangle_count(edges, degree_relabel=True) == want
    assert triangle_count(edges, degree_relabel=False) == want
