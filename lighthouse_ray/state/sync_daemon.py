"""Cron sync daemon: the reference's 15-minute loop, wired end to end.

The reference strings its sync primitives together with a cron driver
(app/jobs/cron.go:15-24): every tick it pulls source rows changed since
the last watermark in keyset-paginated batches of 1000
(chainquery.go:26,67-71,102), bulk-upserts/deletes them into the index
(chainquery.go:127-132), persists the cursor mid-run so a crash resumes
where it left off (chainquery.go:140-149,160-166), and separately
maintains the index (blocklists, enrichment).  This module is that
driver over our primitives: :class:`SyncState` (watermark + cursor),
:class:`IncrementalIndex` (delta build + tombstones + compaction
policy), and a generation pointer for the compaction swap (the ES
reindex-then-swap-alias analog, state/alias.py).

Source-of-truth analog: a Parquet table with the corpus columns plus
``id:int64`` (monotone version id — the reference's ``c.id``),
``modified_at:int64`` (the reference's ``modified_at``) and
``deleted:bool`` (the ``bid_state`` Spent/Expired analog,
chainquery.go:127-132).  A sync pulls ``modified_at >= watermark AND
id > cursor`` ordered by id — predicate-pushdown at the parquet read,
so a tick's cost is proportional to the CHANGED slice, not the corpus.

Durability contract (mirrors the reference): the cursor is persisted
AFTER each batch's delta is applied, so apply is at-least-once; upserts
are idempotent by logical key (last-write-wins shadowing) and
re-applying an identical batch cannot change the live row set —
asserted end-to-end by the soak test, which kills the loop mid-cycle,
resumes it in a fresh daemon, and checks the final compacted index is
byte-identical to a clean build over the same logical rows.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig
from ..util import atomic_write_json, read_json
from .checkpoint import SyncState
from .incremental import IncrementalIndex

CORPUS_COLS = ("repo", "path", "commit", "lang", "content")


class SyncKilled(RuntimeError):
    """Injected mid-cycle failure (tests only): simulates the process
    dying between a delta apply and the next batch."""


def _has_base(index: IncrementalIndex) -> bool:
    return os.path.exists(os.path.join(index.root, "base", "manifest.json"))


def sync_once(
    index: IncrementalIndex,
    state: SyncState,
    source_path: str,
    *,
    now: int,
    batch_size: int = 1000,
    delta_cfg: IndexConfig | None = None,
    fail_after_batches: int | None = None,
) -> dict:
    """One sync tick: pull changed rows after the watermark in keyset
    batches, apply each as a delta (upserts + tombstones), checkpoint
    the cursor after each batch.  Resumes automatically when the
    previous run died mid-cycle (``state.needs_resume``)."""
    import ray.data as rd

    if not state.needs_resume:
        state.begin(now)
    cursor = state.last_id
    watermark = state.last_sync_time

    flt = (pc.field("modified_at") >= watermark) & (pc.field("id") > cursor)
    ds = rd.read_parquet(source_path, filter=flt).sort("id")

    n_batches = n_upserts = n_deletes = n_skipped_deletes = 0
    have_base = _has_base(index)
    for b in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        dead = b["deleted"].to_numpy(zero_copy_only=False)
        ups = b.filter(pa.array(~dead)).select(list(CORPUS_COLS))
        tombs = b.filter(pa.array(dead)).select(["repo", "path"])
        tomb_keys = list(zip(tombs["repo"].to_pylist(), tombs["path"].to_pylist()))
        if not have_base and ups.num_rows:
            # very first indexed batch ever: becomes the base segment —
            # the reference's first sync bulk-indexing into a fresh ES
            # index.  Later batches (and later cycles) are deltas.
            index.build_base(rd.from_arrow(ups), index.cfg)
            have_base = True
            if tomb_keys:
                index.apply_delta(None, tombstone_keys=tomb_keys)
        elif not have_base:
            # tombstone-only batch before any base exists: the keys were
            # never indexed, so recording tombstones is a no-op for
            # correctness but would leave sync.json pointing at a missing
            # base dir, breaking readers()/live_map() until the first
            # upsert arrives — skip (the cursor still advances below, and
            # re-deleting an unindexed key is idempotent by contract)
            n_skipped_deletes += len(tomb_keys)
            tomb_keys = []
        else:
            index.apply_delta(
                rd.from_arrow(ups) if ups.num_rows else None,
                tombstone_keys=tomb_keys,
                cfg=delta_cfg,
            )
        cursor = int(pc.max(b["id"]).as_py())
        n_batches += 1
        n_upserts += ups.num_rows
        n_deletes += len(tomb_keys)
        state.checkpoint(cursor)
        if fail_after_batches is not None and n_batches >= fail_after_batches:
            raise SyncKilled(f"injected kill after batch {n_batches}")
    state.complete()
    return {"batches": n_batches, "upserts": n_upserts, "deletes": n_deletes,
            "skipped_unindexed_deletes": n_skipped_deletes}


class SyncDaemon:
    """The cron driver: owns the workdir layout and the compaction swap.

    Layout::

        <workdir>/generations.json   {"live": "gen-NNNN", "history": [...]}
        <workdir>/sync_state.json    watermark + keyset cursor
        <workdir>/gen-NNNN/          an IncrementalIndex root (base + deltas)

    The live pointer is written atomically; a new daemon (fresh
    process) reconstructs everything from disk — there is no in-memory
    state a crash can lose beyond the at-least-once batch contract.
    """

    def __init__(
        self,
        workdir: str,
        source_path: str,
        cfg: IndexConfig | None = None,
        delta_cfg: IndexConfig | None = None,
        batch_size: int = 1000,
        compact_max_deltas: int | None = None,
        compact_max_delta_frac: float | None = None,
        blocklist_path: str | None = None,
    ):
        self.workdir = workdir
        self.source_path = source_path
        self.blocklist_path = blocklist_path
        self.cfg = cfg or IndexConfig()
        self.delta_cfg = delta_cfg
        self.batch_size = batch_size
        self.compact_max_deltas = compact_max_deltas
        self.compact_max_delta_frac = compact_max_delta_frac
        os.makedirs(workdir, exist_ok=True)
        self.gen_path = os.path.join(workdir, "generations.json")
        self.state = SyncState.load(os.path.join(workdir, "sync_state.json"))
        gens = read_json(self.gen_path) if os.path.exists(self.gen_path) else None
        if gens is None:
            # the base itself is built lazily by the first sync's first
            # batch (sync_once) — the reference's first bulk index
            gens = {"live": "gen-0000", "history": []}
            atomic_write_json(self.gen_path, gens)
        self.gens = gens
        self.index = IncrementalIndex(
            os.path.join(workdir, self.gens["live"]), self.cfg
        )

    # -- one tick -----------------------------------------------------------

    def cycle(self, now: int | None = None, fail_after_batches: int | None = None) -> dict:
        res = sync_once(
            self.index,
            self.state,
            self.source_path,
            now=int(time.time()) if now is None else now,
            batch_size=self.batch_size,
            delta_cfg=self.delta_cfg,
            fail_after_batches=fail_after_batches,
        )
        res["compacted"] = False
        if not _has_base(self.index):
            res["compact_reason"] = "no base yet (nothing synced)"
            return res
        # the reference cron runs the blocked-list job alongside the sync
        # (cron.go:15-24; blocked.go): a JSON file {"doc_ids": [...],
        # "channels": [...]} re-read each tick, applied as tombstones
        # with channel expansion
        res["blocked"] = 0
        if self.blocklist_path and os.path.exists(self.blocklist_path):
            bl = read_json(self.blocklist_path)
            res["blocked"] = self.index.apply_blocklist(
                claim_ids=bl.get("doc_ids"), channels=bl.get("channels")
            )
        kind, reason = self.index.compact_policy(
            max_deltas=self.compact_max_deltas,
            max_delta_frac=self.compact_max_delta_frac,
        )
        res["compact_reason"] = reason
        if kind == "minor":
            # delta-chain-sized fold in place: no generation swap, the
            # base is untouched (the LSM minor compaction)
            info = self.index.minor_compact(self.delta_cfg or self.cfg,
                                            drop_old=True)
            res["compacted"] = "minor"
            res["compact_info"] = info
        elif kind == "major":
            new_name = f"gen-{len(self.gens['history']) + 1:04d}"
            new_idx = self.index.compact(
                os.path.join(self.workdir, new_name), self.cfg
            )
            # swap the live pointer (atomic rename inside) — the alias
            # flip; old generation stays on disk for in-flight readers
            self.gens["history"].append(self.gens["live"])
            self.gens["live"] = new_name
            atomic_write_json(self.gen_path, self.gens)
            self.index = new_idx
            res["compacted"] = "major"
        return res

    # -- the loop -----------------------------------------------------------

    def run(
        self,
        cycles: int,
        interval_s: float = 900.0,
        sleep=time.sleep,
        on_cycle=None,
    ) -> list[dict]:
        """Run ``cycles`` ticks, sleeping ``interval_s`` between them
        (15 min default, cron.go:18).  ``sleep`` is injectable so tests
        and the CLI's --interval 0 don't wait."""
        out = []
        for i in range(cycles):
            res = self.cycle()
            out.append(res)
            if on_cycle is not None:
                on_cycle(i, res)
            if i + 1 < cycles and interval_s > 0:
                sleep(interval_s)
        return out
