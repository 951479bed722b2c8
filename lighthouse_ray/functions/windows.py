"""Time-ordered operators over an event stream: tumbling-window
aggregation, as-of join, and gap sessionization.

These are the classic "operators Ray Data lacks" from the custom-
operator family (windowed aggregate / as-of / range semantics),
expressed on the same two primitives everything else here uses:

- *narrow* per-batch partial aggregation + a tiny final combine for
  the windowed aggregate (windows are a pure function of the row, so
  no time-ordering shuffle is needed at all);
- the map-side partitioned :func:`..functions.exchange.spill_exchange`
  keyed by the entity id for the as-of join and sessionization, whose
  reduces need every row of one user co-located but are fully
  VECTORIZED over the sorted partition (forward-fill via
  ``maximum.accumulate`` / run-length ``reduceat`` — no Python loop
  per user, no per-group callables).

Partitioning assumption (documented per the operator contract): as-of
and sessionization co-locate by the join/session key only — a single
key's history must fit one reduce task, which holds for bounded
per-entity histories (the common case); an unbounded single entity
would need time-range sub-splitting with boundary stitching.

All three are exactly SQL-expressible and oracle-gated in
pipelines/driver_queries.py.  Money-like ``value`` sums go through
integer cents so distributed summation order can never change the
result hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import spill_exchange

US_PER_DAY = 86_400_000_000


def _ts_us(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_agg(ds, ts_col: str = "ts", type_col: str = "event_type",
                        value_col: str = "value", width_us: int = US_PER_DAY):
    """Tumbling-window aggregate: (window_start, type) -> count + exact
    value sum.  The window id is floor(ts / width), a pure per-row
    function, so this is a NARROW partial aggregate per batch followed
    by one tiny groupby over (windows x types) rows — no shuffle of the
    event rows themselves.  Value sums ride as integer cents
    (values are 2-decimal), making the distributed sum order-exact."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window": pa.array([], type=pa.timestamp("us")),
                "event_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        w = (_ts_us(b[ts_col]) // width_us) * width_us
        cents = np.round(
            b[value_col].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "window": pa.array(w),
                "event_type": b[type_col],
                "cents": pa.array(cents),
            }
        )
        g = t.group_by(["window", "event_type"], use_threads=False).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return pa.table(
            {
                "window": g["window"].cast(pa.timestamp("us")),
                "event_type": g["event_type"],
                "n": g["cents_count"].cast(pa.int64()),
                "cents": g["cents_sum"].cast(pa.int64()),
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["window", "event_type"]
    ).aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    return out.map_batches(
        lambda b: pa.table(
            {
                "window": b["window"],
                "event_type": b["event_type"],
                "n": b["n"].cast(pa.int64()),
                "sum_value": pc.divide(b["cents"].cast(pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


def asof_join(ds, left_type: str, right_type: str, key_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              value_col: str = "value", num_parts: int = 32):
    """LEFT as-of join within one stream: for every ``left_type`` event,
    the ``value`` of the most recent ``right_type`` event of the SAME
    key at ``right.ts <= left.ts`` (ties on ts broken by max event id),
    NULL if none.  One spill exchange by key; the reduce sorts the
    partition once by (key, ts, side, id) — right rows before left rows
    at equal ts, so an equal-timestamp right row is visible — and
    forward-fills the last right-row index with one global
    ``maximum.accumulate``, cross-key leakage killed by comparing
    against each key's partition start (earlier keys' indices are
    always smaller).  No per-key loop anywhere."""

    def pre(b: pa.Table) -> pa.Table:
        sel = pc.is_in(b["event_type"], value_set=pa.array([left_type, right_type]))
        t = b.filter(sel)
        return pa.table(
            {
                "k": t[key_col],
                "ts_us": pa.array(_ts_us(t[ts_col])),
                "is_left": pc.equal(t["event_type"], left_type),
                "id": t[id_col],
                "value": t[value_col],
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "asof_value": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("k", "ascending"), ("ts_us", "ascending"),
             ("is_left", "ascending"), ("id", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        k = t["k"].to_numpy(zero_copy_only=False)
        is_left = t["is_left"].to_numpy(zero_copy_only=False)
        idx = np.where(~is_left, np.arange(n, dtype=np.int64), np.int64(-1))
        last_right = np.maximum.accumulate(idx)
        # key run starts: a forward-filled index from an earlier key is
        # always < this key's first row index -> mask it to "no match"
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(n, dtype=np.int64), np.int64(-1))
        )
        ok = last_right >= run_start
        li = np.flatnonzero(is_left)
        vals = t["value"].to_numpy(zero_copy_only=False)
        out_v = np.where(ok[li], vals[np.maximum(last_right[li], 0)], np.nan)
        return pa.table(
            {
                "event_id": t["id"].take(pa.array(li)),
                "user_id": t["k"].take(pa.array(li)),
                "asof_value": pa.array(out_v, type=pa.float64(), from_pandas=True),
            }
        )

    return spill_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "k", reduce_fn,
        num_parts=num_parts,
    )


def range_join_count(ds, left_type: str, right_type: str, window_us: int,
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id", num_parts: int = 32):
    """Range (interval) join within one stream: for every ``left_type``
    event, the COUNT of the same key's ``right_type`` events with
    ``ts`` in the inclusive window ``[left.ts - window_us, left.ts]``.

    One spill exchange by key; the reduce is a single merged sort —
    right rows plus one "left-bound" and one "right-bound" marker per
    left row, ordered (key, ts, marker) so an equal-ts right row falls
    INSIDE both inclusive bounds — and a cumulative right-row count
    whose difference at the two markers is the window count.  No
    per-key loop, no per-pair work: cost is sort + cumsum regardless
    of window fan-out (the join itself is never materialized)."""

    def pre(b: pa.Table) -> pa.Table:
        lt = b.filter(pc.equal(b["event_type"], left_type))
        rt = b.filter(pc.equal(b["event_type"], right_type))
        lts = _ts_us(lt[ts_col])
        parts = [
            # marker -1: left bound at ts-W (sorts before equal-ts rights)
            pa.table(
                {
                    "k": lt[key_col],
                    "ts_us": pa.array(lts - window_us),
                    "marker": pa.array(np.full(len(lts), -1, dtype=np.int8)),
                    "id": lt[id_col],
                }
            ),
            # marker 0: the right rows being counted
            pa.table(
                {
                    "k": rt[key_col],
                    "ts_us": pa.array(_ts_us(rt[ts_col])),
                    "marker": pa.array(np.zeros(rt.num_rows, dtype=np.int8)),
                    "id": rt[id_col],
                }
            ),
            # marker 1: right bound at ts (sorts after equal-ts rights)
            pa.table(
                {
                    "k": lt[key_col],
                    "ts_us": pa.array(lts),
                    "marker": pa.array(np.ones(len(lts), dtype=np.int8)),
                    "id": lt[id_col],
                }
            ),
        ]
        return pa.concat_tables(parts)

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "n_in_window": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("k", "ascending"), ("ts_us", "ascending"),
             ("marker", "ascending"), ("id", "ascending")]
        ).combine_chunks()
        marker = t["marker"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(marker == 0)
        lo = np.flatnonzero(marker == -1)
        hi = np.flatnonzero(marker == 1)
        if len(lo) == 0:
            return empty
        # both marker lists sort by (k, ts-derived, id): order of the
        # SAME left rows, so lo[i] and hi[i] belong to one left event
        ids_lo = t["id"].take(pa.array(lo))
        ids_hi = t["id"].take(pa.array(hi))
        order_lo = pc.sort_indices(ids_lo)
        order_hi = pc.sort_indices(ids_hi)
        lo = lo[order_lo.to_numpy(zero_copy_only=False)]
        hi = hi[order_hi.to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "event_id": ids_lo.take(order_lo),
                "user_id": t["k"].take(pa.array(lo)),
                "n_in_window": pa.array(cum[hi] - cum[lo]),
            }
        )

    return spill_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "k", reduce_fn,
        num_parts=num_parts,
    )


def sessionize(ds, gap_us: int, key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", num_parts: int = 32):
    """Gap-based sessionization: per key, order events by (ts, id) and
    start a new session whenever the gap to the previous event exceeds
    ``gap_us``; emit one row per session (key, session_idx within key,
    n_events, duration in integer microseconds).  One spill exchange by
    key; the reduce is a single sort + run-length pass —
    session boundaries by vectorized gap compare, per-session stats by
    ``reduceat``, per-key session numbering by subtracting each key's
    first session ordinal.  No per-key Python."""

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b[key_col],
                "ts_us": pa.array(_ts_us(b[ts_col])),
                "id": b[id_col],
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "session_idx": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "dur_us": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("k", "ascending"), ("ts_us", "ascending"), ("id", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        k = t["k"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = new_key | (gap > gap_us)
        sess_starts = np.flatnonzero(new_sess)
        sess_lens = np.diff(np.append(sess_starts, n))
        sess_ends = sess_starts + sess_lens - 1
        # session ordinal within its key: global session number minus
        # the ordinal of the key's first session
        key_first_sess = np.flatnonzero(new_key[sess_starts])
        sess_of_key = np.zeros(len(sess_starts), dtype=np.int64)
        sess_of_key[key_first_sess] = 1
        key_base = np.flatnonzero(sess_of_key)[np.cumsum(sess_of_key) - 1]
        session_idx = np.arange(len(sess_starts), dtype=np.int64) - key_base + 1
        return pa.table(
            {
                "user_id": t["k"].take(pa.array(sess_starts)),
                "session_idx": pa.array(session_idx),
                "n_events": pa.array(sess_lens.astype(np.int64)),
                "dur_us": pa.array(ts[sess_ends] - ts[sess_starts]),
            }
        )

    return spill_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "k", reduce_fn,
        num_parts=num_parts,
    )


def session_funnel(ds, first_type: str = "click", then_type: str = "purchase",
                   gap_us: int = US_PER_DAY // 4, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   type_col: str = "event_type", num_parts: int = 32):
    """Session funnel conversion: among gap-based sessions (same
    boundaries as :func:`sessionize`), count sessions containing a
    ``then_type`` event STRICTLY after their first ``first_type`` event.

    One spill exchange by key; the reduce finds session boundaries with
    the sessionize pass and computes per-session first-A / last-B
    timestamps with masked ``reduceat`` — no per-session Python.  Each
    partition emits ONE (n_sessions, n_converted) partial row; the
    caller sums |partitions| integers, so nothing row-sized ever
    reaches the driver."""

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b[key_col],
                "ts_us": pa.array(_ts_us(b[ts_col])),
                "id": b[id_col],
                "et": b[type_col],
            }
        )

    I64MAX = np.iinfo(np.int64).max
    I64MIN = np.iinfo(np.int64).min

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"n_sessions": pa.array([], pa.int64()), "n_converted": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("k", "ascending"), ("ts_us", "ascending"), ("id", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        k = t["k"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        et = t["et"].to_numpy(zero_copy_only=False)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        starts = np.flatnonzero(new_key | (gap > gap_us))
        first_a = np.minimum.reduceat(np.where(et == first_type, ts, I64MAX), starts)
        last_b = np.maximum.reduceat(np.where(et == then_type, ts, I64MIN), starts)
        conv = (first_a != I64MAX) & (last_b > first_a)
        return pa.table(
            {
                "n_sessions": pa.array([len(starts)], pa.int64()),
                "n_converted": pa.array([int(conv.sum())], pa.int64()),
            }
        )

    return spill_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "k", reduce_fn,
        num_parts=num_parts,
    )


def rolling_user_agg(ds, window: int = 3, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value", num_parts: int = 32):
    """Per-key ordered-frame window functions — running total plus a
    ``window``-row trailing mean of ``value`` over events ordered by
    (ts, id) within each key (the ROWS BETWEEN window-frame family).

    One spill exchange by key; the reduce is a single sort + global
    cumsum with per-run offsets — the trailing-frame sum at row i is
    ``cum[i] - cum[max(run_start, i - window + 1) - 1]``, all index
    arithmetic, no per-key Python.  Values ride as integer cents so the
    running sums are order-exact at any layout; the single float
    division per output row happens once, after all arithmetic."""

    def pre(b: pa.Table) -> pa.Table:
        cents = np.round(
            b[value_col].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "k": b[key_col],
                "ts_us": pa.array(_ts_us(b[ts_col])),
                "id": b[id_col],
                "cents": pa.array(cents),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "running_total": pa.array([], type=pa.float64()),
                "rolling_mean": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("k", "ascending"), ("ts_us", "ascending"), ("id", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        k = t["k"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        cum = np.cumsum(cents)
        run_base = np.where(run_start > 0, cum[run_start - 1], 0)
        running = cum - run_base
        lo = np.maximum(run_start, np.arange(n) - window + 1)
        lo_base = np.where(lo > 0, cum[lo - 1], 0)
        frame_sum = cum - lo_base
        frame_cnt = np.arange(n) - lo + 1
        # op order mirrors the SQL: (CAST(sum AS DOUBLE) / cnt) / 100
        rolling = frame_sum.astype(np.float64) / frame_cnt / 100.0
        return pa.table(
            {
                "event_id": t["id"].cast(pa.int64()),
                "user_id": t["k"].cast(pa.int64()),
                "running_total": pa.array(running.astype(np.float64) / 100.0),
                "rolling_mean": pa.array(rolling),
            }
        )

    return spill_exchange(
        ds.map_batches(pre, batch_format="pyarrow"), "k", reduce_fn,
        num_parts=num_parts,
    )


def late_window_agg(ds, *, lateness_us: int, bucket_size: int = 4096,
                    num_parts: int = 16):
    """Event-time tumbling-day windows with a WATERMARK and allowed
    lateness — the streaming semantic Ray Data has no operator for,
    made deterministic for batch verification: processing order is the
    ``arrival`` column (a real stream's ingestion sequence; tie-break
    ``event_id``), the watermark at each event is the running max
    event-time over everything that arrived before-or-at it, and an
    event is DROPPED-late iff ``ts < watermark − lateness`` (the Flink
    allowed-lateness rule).  Output per day window: kept count, exact
    kept cent-sum (as DOUBLE/100 for SQL comparability) and the
    dropped-late count — the per-window late-data audit.

    Distributed shape (a distributed PREFIX-MAX, not a sort): pass A
    computes per-``arrival//bucket_size``-bucket max-ts partials (one
    tiny groupby); the driver prefix-maxes the bucket array (bucket-
    count-sized) and broadcasts it; pass B is ONE exchange keyed by
    bucket whose reduce sorts only ITS bucket by (arrival, event_id),
    runs a local cumulative max seeded by the previous buckets'
    prefix, and emits per-window partials — ≤ |windows| rows per
    partition.  No global sort anywhere."""
    import ray
    from ray.data.aggregate import Sum

    def bucket_of(arr: np.ndarray) -> np.ndarray:
        return arr // bucket_size

    def partial_max(b: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "mx": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        arr = b["arrival"].to_numpy(zero_copy_only=False)
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = bucket_of(arr)
        order = np.argsort(bk, kind="stable")
        bks, tss = bk[order], ts[order]
        starts = np.flatnonzero(np.diff(bks, prepend=bks[0] - 1))
        mx = np.maximum.reduceat(tss, starts)
        return pa.table({"bucket": pa.array(bks[starts]), "mx": pa.array(mx)})

    parts = (
        ds.map_batches(partial_max, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(ray.data.aggregate.Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = parts["bucket"].to_numpy(np.int64)
    # dense prefix: prefix[i] = max ts over all buckets < buckets[i]
    mx = parts["mx"].to_numpy(np.int64)
    run = np.maximum.accumulate(mx)
    prefix_of = {int(b): int(run[i - 1]) if i else np.iinfo(np.int64).min
                 for i, b in enumerate(buckets)}
    pref = ray.put(prefix_of)

    def reduce_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "window": pa.array([], type=pa.timestamp("us")),
            "n_kept": pa.array([], type=pa.int64()),
            "kept_cents": pa.array([], type=pa.int64()),
            "n_late": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        import ray as _r

        pr = _r.get(pref)
        arr = t["arrival"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bk = bucket_of(arr)
        order = np.lexsort((eid, arr, bk))  # bucket-major, then stream order
        bk_s, ts_s = bk[order], ts[order]
        starts = np.flatnonzero(np.diff(bk_s, prepend=bk_s[0] - 1))
        # seeded cumulative max per bucket run (runs per partition are few)
        ends = np.append(starts[1:], len(ts_s))
        wm = np.empty_like(ts_s)
        for s, e in zip(starts, ends):
            seed = pr.get(int(bk_s[s]), np.iinfo(np.int64).min)
            run_ = np.maximum.accumulate(ts_s[s:e])
            wm[s:e] = np.maximum(run_, seed)
        late = ts_s < wm - lateness_us
        day_us = 86_400_000_000
        win = (ts_s // day_us) * day_us
        keys, inv = np.unique(win, return_inverse=True)
        n_late = np.bincount(inv, weights=late.astype(np.int64)).astype(np.int64)
        n_kept = np.bincount(inv, weights=(~late).astype(np.int64)).astype(np.int64)
        kc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(kc, inv[~late], cents[order][~late])
        return pa.table({
            "window": pa.array(keys, type=pa.int64()).cast(pa.timestamp("us")),
            "n_kept": pa.array(n_kept),
            "kept_cents": pa.array(kc),
            "n_late": pa.array(n_late),
        })

    agg = spill_exchange(ds, lambda b: bucket_of(
        b["arrival"].to_numpy(zero_copy_only=False)).astype(np.uint64),
        reduce_fn, num_parts=num_parts)
    return (
        agg.groupby("window")
        .aggregate(Sum("n_kept", alias_name="n_kept"),
                   Sum("kept_cents", alias_name="kept_cents"),
                   Sum("n_late", alias_name="n_late"))
    )
