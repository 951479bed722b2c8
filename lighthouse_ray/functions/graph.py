"""Distributed graph operators over edge-list Datasets.

PageRank and triangle counting in the Pregel-by-joins shape: the graph
lives as a (src, dst) edge Dataset, per-iteration state is a node-keyed
Dataset, and every step is an exchange the streaming executor can spill
— no adjacency structure is ever driver-held.

Determinism contract (the same convention as the distributed k-means):
PageRank runs in FIXED-POINT integer arithmetic — ranks are int64
scaled by 10^12, contributions use floor division — so the distributed
sum is order-exact and results are bit-identical at any parallelism /
block layout, and an unrolled integer SQL mirror can verify every
value.  The quantization error per iteration is ≤ outdeg ulps of
10^-12 per node, far below anything a float implementation guarantees
across reduction orders.

Scale notes:
- PageRank: per iteration, one shuffle join (edges x ranks on src — the
  edge side can be pre-partitioned once and reused), one groupby-sum on
  dst, one left join back to the node set.  State is O(nodes); traffic
  is O(edges) per iteration.  Dangling mass is dropped (documented; the
  node set's teleport term keeps every node's rank positive).
- Triangles: node-iterator with the smallest-endpoint convention —
  wedges are generated only at each edge's SMALLER endpoint, so every
  triangle a<b<c is counted exactly once at center a, and per-center
  work is quadratic in the HIGHER-neighbor degree only (the classic
  degree-ordering trick falls out for free on id-ordered canon edges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _run_bounds
from .exchange import spill_exchange

PR_SCALE = 10**12


def pagerank(edges, nodes, iters: int = 3, damping_pct: int = 85,
             num_parts: int = 32):
    """Fixed-point PageRank: returns a Dataset (node, rank) with rank
    int64-scaled by ``PR_SCALE``.

    ``edges``: Dataset with int64 columns (src, dst).  ``nodes``:
    Dataset with int64 column (node) — every node that should receive a
    teleport share, including isolated ones.  ``iters`` fixed
    iterations of  rank = base + (damping_pct * Σ_in rank_src //
    outdeg_src) // 100  with base = ((100 - damping_pct) * SCALE) //
    (100 * n_nodes).
    """
    from ray.data.aggregate import Sum

    from .joins import shuffle_join

    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    def count_deg(b: pa.Table) -> pa.Table:
        g = b.group_by("src").aggregate([([], "count_all")])
        return pa.table({"node": g["src"], "deg": g["count_all"].cast(pa.int64())})

    deg = (
        edges.map_batches(count_deg, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("deg", alias_name="outdeg"))
    )

    # state: (node, outdeg, rank); isolated/dangling nodes carry outdeg 0
    state = shuffle_join(
        nodes, deg, key="node", lcols=[], rcols=["outdeg"], how="left",
        num_parts=num_parts,
    ).map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "outdeg": b["outdeg"].cast(pa.int64()).fill_null(0),
                "rank": pa.array(np.full(b.num_rows, r0, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    src_edges = edges.map_batches(
        lambda b: pa.table({"node": b["src"].cast(pa.int64()), "dst": b["dst"].cast(pa.int64())}),
        batch_format="pyarrow",
    )

    for _ in range(iters):
        # contribution of every edge: rank_src // outdeg_src
        j = shuffle_join(
            src_edges, state, key="node", lcols=["dst"], rcols=["outdeg", "rank"],
            how="inner", num_parts=num_parts,
        )

        def contrib(b: pa.Table) -> pa.Table:
            c = b["rank"].to_numpy() // b["outdeg"].to_numpy()
            return pa.table({"dst": b["dst"], "c": pa.array(c.astype(np.int64))})

        sums = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pa.table(
                    {"node": b["dst"].cast(pa.int64()), "c": b["c"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )
        )
        state = shuffle_join(
            state, sums, key="node", lcols=["outdeg"], rcols=["c"], how="left",
            num_parts=num_parts,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].cast(pa.int64()),
                    "outdeg": b["outdeg"].cast(pa.int64()),
                    "rank": pa.array(
                        base
                        + (damping_pct * b["c"].cast(pa.int64()).fill_null(0).to_numpy())
                        // 100
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": b["rank"]}),
        batch_format="pyarrow",
    )


def triangle_count(edges, num_parts: int = 32) -> int:
    """Exact global triangle count of the UNDIRECTED graph underlying
    the (src, dst) edge Dataset (direction and duplicates ignored,
    self-loops dropped).

    Three exchanges: canonicalize+distinct by (a, b); wedge generation
    at each edge's smaller endpoint (pairs of higher neighbors y < z,
    each triangle generated exactly once); wedge-vs-edge match on
    (y, z).  Shuffled volume is O(E) + O(Σ_a deg_hi(a)²) wedge rows —
    the id-ordering bound, the standard node-iterator trade."""
    import pyarrow.compute as pc

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))}
        )

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    canon_edges = spill_exchange(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"], distinct,
        num_parts=num_parts,
    )

    def wedges(t: pa.Table) -> pa.Table:
        # all rows of a center (smaller endpoint) are co-located: emit
        # every pair (y < z) of its higher neighbors, index arithmetic
        empty = pa.table({"y": pa.array([], pa.int64()), "z": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int8())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("a", "ascending"), ("b", "ascending")]).combine_chunks()
        nbr = t["b"].to_numpy()
        starts, lens = _run_bounds(t["a"].combine_chunks())
        m = lens * (lens - 1) // 2
        total = int(m.sum())
        if total == 0:
            return empty
        # per run of length L: pairs (i, j), 0 <= i < j < L, vectorized
        run_of_pair = np.repeat(np.arange(len(lens)), m)
        off = np.arange(total) - np.repeat(np.cumsum(m) - m, m)
        L = lens[run_of_pair]
        # i = row index of the pair's first element within its run:
        # off counts pairs in row-major order ((0,1),(0,2)..,(1,2)..)
        # solve smallest i with cum_i = i*L - i(i+1)/2 > off - ... use
        # the closed form via triangular-number inversion
        # cum(i) = i*(2L - i - 1)/2 pairs before row i
        fi = np.floor(
            (2 * L - 1 - np.sqrt((2 * L - 1) ** 2 - 8 * off.astype(np.float64))) / 2
        ).astype(np.int64)
        # guard against float boundary error (one step each way)
        cum = fi * (2 * L - fi - 1) // 2
        fi -= (cum > off).astype(np.int64)
        cum = fi * (2 * L - fi - 1) // 2
        nxt = (fi + 1) * (2 * L - fi - 2) // 2
        bump = nxt <= off
        fi += bump.astype(np.int64)
        cum = np.where(bump, nxt, cum)
        j = off - cum + fi + 1
        yi = nbr[starts[run_of_pair] + fi]
        zi = nbr[starts[run_of_pair] + j]
        return pa.table(
            {"y": pa.array(yi), "z": pa.array(zi),
             "is_edge": pa.array(np.zeros(total, dtype=np.int8))}
        )

    wedge_ds = spill_exchange(canon_edges, "a", wedges, num_parts=num_parts)
    edge_tagged = canon_edges.map_batches(
        lambda b: pa.table(
            {"y": b["a"].cast(pa.int64()), "z": b["b"].cast(pa.int64()),
             "is_edge": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        ),
        batch_format="pyarrow",
    )

    def match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        t = t.sort_by(
            [("y", "ascending"), ("z", "ascending")]
        ).combine_chunks()
        key = pc.binary_join_element_wise(
            pc.cast(t["y"], pa.string()), pc.cast(t["z"], pa.string()), ":"
        )
        starts, lens = _run_bounds(key)
        is_e = t["is_edge"].to_numpy().astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(is_e)])
        has_edge = (cs[starts + lens] - cs[starts]) > 0
        wedge_cnt = lens - (cs[starts + lens] - cs[starts])
        n = int((wedge_cnt * has_edge).sum())
        return pa.table({"n": pa.array([n], type=pa.int64())})

    parts = spill_exchange(
        wedge_ds.union(edge_tagged), ["y", "z"], match, num_parts=num_parts
    )
    return int(parts.sum("n") or 0)
