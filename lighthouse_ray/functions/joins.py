"""Large-x-large reduce-side joins.

Ray Data (2.49) has no native join; the repo's broadcast-hash join
(pipelines/driver_queries.py::q_join_broadcast) covers the
small-side case.  This module adds the other half: a SHUFFLE HASH
JOIN for two large inputs, built on the same map-side partitioned
:func:`..functions.exchange.spill_exchange` every wide operator here
uses — both sides spill by a routing hash of the key, one reduce task
per partition sorts its co-located slice once and emits the equal-key
cross products fully vectorized (repeat/arange arithmetic over run
lengths — no per-key Python, no hash dict of either side).

Partitioning assumption: all rows of ONE key (both sides together)
fit a reduce task — the standard shuffle-join contract; skewed keys
want the same salting treatment the index build gives hot terms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import spill_exchange

_SIDE = "__side"
_SALT = "__salt"


def _null_column(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def bloom_or_tree(parts, cols: list[str], nbytes_by_col: dict[str, int],
                  fanin: int = 8) -> list:
    """Distributed OR tree-reduce of per-batch packed bitmaps (VERDICT
    r4 item 5): ``parts`` is a Dataset with one ``binary`` column per
    name in ``cols`` — one packed-bitmap row per input batch.  Returns
    one ObjectRef per column holding the OR'd ``np.uint8`` array.

    The driver holds only ObjectRefs: leaf tasks OR the Arrow blocks
    where they live, interior tasks OR ``fanin`` children, and the root
    splits per column — at many batches the old driver-serial loop
    (one m/8-byte blob pulled per batch) becomes a log-depth tree whose
    bytes never touch the driver.  The final refs plug directly into
    the probe stages' ``ray.get`` (same contract as ``ray.put``)."""
    import ray

    sizes = [int(nbytes_by_col[c]) for c in cols]

    @ray.remote
    def _or(*items):
        acc = [np.zeros(s, dtype=np.uint8) for s in sizes]
        for it in items:
            if isinstance(it, list):  # interior node: child accumulators
                for a, x in zip(acc, it):
                    a |= x
            else:  # leaf: an Arrow block of packed-bitmap rows
                if it.num_rows == 0 or cols[0] not in it.schema.names:
                    continue  # empty blocks may carry a stale schema
                for a, c in zip(acc, cols):
                    for blob in it[c].to_pylist():
                        a |= np.frombuffer(blob, dtype=np.uint8)
        return acc

    refs = [br for bundle in parts.iter_internal_ref_bundles()
            for br in bundle.block_refs]
    if not refs:
        refs = [_or.remote()]  # all-zero filters
    else:
        # leaf pass always runs (a lone block must still be folded from
        # bitmap ROWS into an accumulator before the interior contract)
        refs = [_or.remote(*refs[i:i + fanin]) for i in range(0, len(refs), fanin)]
    while len(refs) > 1:
        refs = [_or.remote(*refs[i:i + fanin]) for i in range(0, len(refs), fanin)]
    if len(cols) == 1:
        @ray.remote
        def _first(acc):
            return acc[0]

        return [_first.remote(refs[0])]

    @ray.remote(num_returns=len(cols))
    def _split(acc):
        return tuple(acc)

    return list(_split.remote(refs[0]))


def shuffle_join(left, right, key: str, lcols: list[str], rcols: list[str],
                 how: str = "inner", num_parts: int = 32,
                 hot_keys=None, salt: int = 8,
                 stats: dict | None = None, cleanup_after: list[str] | None = None):
    """Join ``left`` and ``right`` Datasets on ``key``.

    ``lcols`` / ``rcols`` name the payload columns to carry from each
    side (key excluded; output schema is [key, *lcols, *rcols]).
    ``how``: "inner", "left" (left outer: unmatched left rows keep
    nulls in ``rcols``) or "outer" (full outer: unmatched rows from
    EITHER side survive with the other side's columns null — the key
    run already co-locates both sides, so lone runs cost nothing
    extra).  ``hot_keys`` is incompatible with "outer": right hot rows
    replicate to every salt bucket, so a lone hot right row would be
    emitted ``salt`` times.

    One exchange total: both sides are tagged and mapped to the common
    output schema (absent side's columns null), the exchange co-locates
    every key, and the reduce emits each key run's |L|x|R| cross
    product with pure index arithmetic.

    ``hot_keys`` enables the SKEW path (the same treatment the index
    build gives hot terms): each hot key's RIGHT rows replicate to
    ``salt`` buckets while its LEFT rows split across them by a
    content hash, so one giant key's cross product spreads over
    ``salt`` reduce tasks instead of serializing on one.  The bucket
    rides as a column and the reduce runs per (key, bucket), so no
    pair is ever emitted twice.  (Only the left side's rows fan out in
    count 1; right hot rows cost x``salt`` replication — put the
    smaller-per-hot-key side on the right.)
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how={how!r}: only inner/left/outer supported")
    if how == "outer" and hot_keys:
        raise ValueError("hot_keys requires inner/left: replicated right "
                         "hot rows would duplicate lone outer emissions")
    hot = set(hot_keys) if hot_keys else None
    lsch = left.schema()
    rsch = right.schema()
    ltypes = {n: t for n, t in zip(lsch.names, lsch.types)}
    rtypes = {n: t for n, t in zip(rsch.names, rsch.types)}
    key_t = ltypes[key]
    out_fields = (
        [(key, key_t)]
        + [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols]
    )
    schema = pa.schema(out_fields + [(_SIDE, pa.int8()), (_SALT, pa.int32())])

    if set(lcols) & set(rcols):
        raise ValueError("lcols/rcols must be disjoint — rename before joining")

    def tag(side: int, cols: list[str]):
        own = {key, *cols}

        def f(b: pa.Table) -> pa.Table:
            from .exchange import combine_hashes, routing_hash

            n = b.num_rows
            arrays = [
                b[name].combine_chunks().cast(typ) if name in own else _null_column(n, typ)
                for name, typ in out_fields
            ]
            buckets = np.zeros(n, dtype=np.int32)
            if hot is not None and n:
                kh = pc.is_in(
                    b[key], value_set=pa.array(sorted(hot), type=ltypes[key])
                ).to_numpy(zero_copy_only=False)
                hi = np.flatnonzero(kh)
                if len(hi):
                    if side == 0:
                        # left hot rows: one bucket each, by content hash
                        ch = combine_hashes(
                            *(routing_hash(b[c]) for c in [key, *cols])
                        )[hi]
                        buckets[hi] = (ch % np.uint64(salt)).astype(np.int32)
                    else:
                        # right hot rows: replicate to every bucket
                        rep_idx = np.concatenate(
                            [np.arange(n, dtype=np.int64)]
                            + [hi] * (salt - 1)
                        )
                        arrays = [a.take(pa.array(rep_idx)) for a in arrays]
                        buckets = np.concatenate(
                            [buckets]
                            + [np.full(len(hi), s, dtype=np.int32) for s in range(1, salt)]
                        )
                        n = len(rep_idx)
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            arrays.append(pa.array(buckets))
            return pa.Table.from_arrays(arrays, schema=schema)

        return f

    tagged = left.map_batches(tag(0, lcols), batch_format="pyarrow").union(
        right.map_batches(tag(1, rcols), batch_format="pyarrow")
    )

    def route(batch: pa.Table) -> np.ndarray:
        from .exchange import combine_hashes, routing_hash

        return combine_hashes(
            routing_hash(batch[key]),
            batch[_SALT].to_numpy(zero_copy_only=False).astype(np.uint64),
        )

    def join_reduce(t: pa.Table) -> pa.Table:
        empty = pa.schema(out_fields).empty_table()
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [(key, "ascending"), (_SALT, "ascending"), (_SIDE, "ascending")]
        ).combine_chunks()
        keys = t[key].combine_chunks()
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        slt = t[_SALT].to_numpy(zero_copy_only=False)
        m = len(side)
        neq = pc.not_equal(keys.slice(1), keys.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        ) if m > 1 else np.zeros(0, dtype=bool)
        change = np.empty(m, dtype=bool)
        change[0] = True
        change[1:] = neq | (slt[1:] != slt[:-1])
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, m))
        # within each key run, left rows (side 0) precede right rows
        n_r = np.add.reduceat(side.astype(np.int64), starts)
        n_l = lens - n_r
        counts = n_l * n_r
        total = int(counts.sum())
        li = np.zeros(0, dtype=np.int64)
        ri = np.zeros(0, dtype=np.int64)
        if total:
            run_of = np.repeat(np.arange(len(starts)), counts)
            cum = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=cum[1:])
            local = np.arange(total, dtype=np.int64) - cum[run_of]
            li = starts[run_of] + local // n_r[run_of]
            ri = starts[run_of] + n_l[run_of] + local % n_r[run_of]

        def expand_runs(rr: np.ndarray, cnt: np.ndarray, base: np.ndarray) -> np.ndarray:
            # all row indices of the selected runs: base[j] .. base[j]+cnt[j]
            if len(rr) == 0:
                return np.zeros(0, dtype=np.int64)
            run_pos = np.repeat(np.arange(len(rr)), cnt)
            cum2 = np.zeros(len(rr), dtype=np.int64)
            np.cumsum(cnt[:-1], out=cum2[1:])
            return base[run_pos] + (
                np.arange(int(cnt.sum()), dtype=np.int64) - cum2[run_pos]
            )

        # unmatched left runs (left/outer): left rows sit at the run start
        lidx = np.zeros(0, dtype=np.int64)
        if how in ("left", "outer"):
            lr = np.flatnonzero((n_r == 0) & (n_l > 0))
            lidx = expand_runs(lr, n_l[lr], starts[lr])
        # unmatched right runs (outer): with n_l == 0 the right rows also
        # sit at the run start
        ridx = np.zeros(0, dtype=np.int64)
        if how == "outer":
            rr2 = np.flatnonzero((n_l == 0) & (n_r > 0))
            ridx = expand_runs(rr2, n_r[rr2], starts[rr2])

        arrays = []
        lset = set(lcols)
        for name, typ in out_fields:
            col = t[name].combine_chunks()
            from_left = name == key or name in lset
            parts = [col.take(pa.array(li if from_left else ri))]
            if len(lidx):
                parts.append(
                    col.take(pa.array(lidx)) if from_left else _null_column(len(lidx), typ)
                )
            if len(ridx):
                # the key rides on BOTH sides' tagged rows, so a lone right
                # run still carries it
                parts.append(
                    col.take(pa.array(ridx))
                    if (name == key or name not in lset)
                    else _null_column(len(ridx), typ)
                )
            arrays.append(parts[0] if len(parts) == 1 else pa.concat_arrays(parts))
        return pa.Table.from_arrays(arrays, schema=pa.schema(out_fields))

    # stats/cleanup_after pass straight through to the exchange (root
    # exposure + Spark-style shuffle GC of consumed upstream roots)
    return spill_exchange(tagged, route, join_reduce, num_parts=num_parts,
                          stats=stats, cleanup_after=cleanup_after)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction (anti-join against a large key set)
# ---------------------------------------------------------------------------

def _bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch &
    Mitzenmacher 2006), both derived from the exchange's splitmix64
    (one finalizer implementation in the repo; nothing pins the bloom
    hash family — correctness is exact regardless)."""
    from .exchange import _SPLITMIX_C1, splitmix64

    x = keys.astype(np.uint64)
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ _SPLITMIX_C1) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_anti_join(big, keys, key: str, cols: list[str],
                    m_bits: int = 1 << 20, k_hashes: int = 4,
                    num_parts: int = 32, stats: dict | None = None):
    """Rows of ``big`` whose ``key`` does NOT appear in ``keys`` —
    exact result, bloom-accelerated.

    The scale problem: scrubbing a 100 TB corpus against a key set too
    big to broadcast exactly (billions of URLs/ids) normally shuffles
    the ENTIRE corpus through an anti-join exchange.  The classic fix
    is a semi-join reduction: broadcast a Bloom filter of the key set
    (m_bits/8 bytes — MBs where the exact set is GBs), let every batch
    drop its bloom-NEGATIVE rows locally (definite keeps — a bloom has
    no false negatives), and route only the bloom-POSITIVE sliver
    through the exact left-outer :func:`shuffle_join` to weed out the
    false positives.  Exchange volume drops from |big| to
    |matches| + fp_rate x |big|.

    The filter itself is built distributed: each ``keys`` batch emits
    one packed-bitmap row, the driver ORs the per-batch bitmaps (one
    m/8-byte row per batch reaches the driver, never the key rows).

    Both inputs are scanned ONCE: ``keys`` is materialized (object
    store, distributed) and feeds the bloom build and the join's marker
    side; ``big`` runs a single probe pass that tags every row with its
    bloom verdict, the tagged blocks are materialized, and the
    fast-keep / candidate split filters those blocks zero-copy — no
    second read-and-rehash of the dominant input.  (Trade-off: the
    tagged corpus transits the object store and may spill; where source
    re-reads are cheaper than local spill capacity, re-scanning would
    be preferable — at the blocklist scales this targets, one scan
    wins.)

    ``stats`` (tests/observability): filled with ``fast_keeps`` /
    ``candidates`` Dataset handles so callers can count the split.
    """
    import ray

    nbytes = (m_bits + 7) // 8
    keys = keys.materialize()

    def build(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if b.num_rows:
            k = b[key].to_numpy(zero_copy_only=False)
            pos = _bloom_positions(k, m_bits, k_hashes).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    # distributed OR tree-reduce: bitmap bytes never touch the driver
    (bref,) = bloom_or_tree(
        keys.map_batches(build, batch_format="pyarrow"),
        ["bits"], {"bits": nbytes},
    )

    out_cols = [key, *cols]

    def probe_tag(b: pa.Table) -> pa.Table:
        import ray as _r

        if b.num_rows == 0:
            return b.select(out_cols).append_column(
                "__bloom", pa.array([], type=pa.int8())
            )
        bm = _r.get(bref)
        pos = _bloom_positions(
            b[key].to_numpy(zero_copy_only=False), m_bits, k_hashes
        )
        hit = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        return b.select(out_cols).append_column("__bloom", pa.array(hit.astype(np.int8)))

    tagged = big.map_batches(probe_tag, batch_format="pyarrow").materialize()

    def side(want: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["__bloom"], want)).select(out_cols)

        return f

    fast_keeps = tagged.map_batches(side(0), batch_format="pyarrow")
    candidates = tagged.map_batches(side(1), batch_format="pyarrow")
    if stats is not None:
        stats["fast_keeps"] = fast_keeps
        stats["candidates"] = candidates

    marked = keys.map_batches(
        lambda b: pa.table({key: b[key],
                            "__hit": pa.array(np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow",
    )
    joined = shuffle_join(candidates, marked, key=key, lcols=cols,
                          rcols=["__hit"], how="left", num_parts=num_parts)
    verified = joined.map_batches(
        lambda b: b.filter(pc.is_null(b["__hit"])).select([key, *cols]),
        batch_format="pyarrow",
    )
    return fast_keeps.union(verified)
