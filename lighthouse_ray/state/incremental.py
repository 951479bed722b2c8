"""Incremental index maintenance: delta segments, tombstones, compaction.

The reference maintains its index as an incrementally-updated
materialized view: the cron sync upserts changed claims by ``_id`` and
deletes spent/expired ones (chainquery.go:76-158, claim.go:142-157);
blocklists delete more (blocked.go).  Our analog:

- ``apply_delta(rows)`` builds a **delta index** (the same full build
  pipeline, small input) under ``<root>/deltas/delta-NNNN`` and records
  it, plus explicit **tombstones** (logical keys to delete), in
  ``sync.json``.
- Reads go through :class:`IncrementalIndex`: a doc is *live* if its
  logical key's newest occurrence (later delta > earlier delta > base)
  is an upsert, and not tombstoned.  Search runs per segment and merges
  top-k with shadowing — per-segment BM25 stats, exactly like
  per-shard scoring in ES before DFS (documented approximation).
- ``compact(new_root)`` rebuilds one canonical index from the merged
  live doc set — **bit-identical to a from-scratch build over the same
  logical rows** (asserted in tests): incremental gives freshness,
  compaction restores exactness.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import IndexConfig
from ..index import IndexReader
from ..util import atomic_write_json, read_json


def _key(repo: str, path: str) -> str:
    return f"{repo}\0{path}"


class IncrementalIndex:
    def __init__(self, root: str, cfg: IndexConfig | None = None):
        self.root = root
        self.cfg = cfg or IndexConfig()
        self.sync_path = os.path.join(root, "sync.json")
        self.state = read_json(self.sync_path) if os.path.exists(self.sync_path) else {
            "deltas": [],
            "tombstones": [],
        }
        self._readers: list[IndexReader] | None = None

    # -- building -----------------------------------------------------------

    def build_base(self, source, cfg: IndexConfig | None = None) -> None:
        from ..build import build_index

        if cfg is not None:
            self.cfg = cfg
        build_index(source, os.path.join(self.root, "base"), self.cfg)
        self._save()
        self._readers = None

    def apply_delta(self, source, tombstone_keys: list[tuple[str, str]] | None = None) -> str:
        """Upsert the rows of ``source`` (corpus schema) and delete the
        given logical (repo, path) keys; returns the delta dir."""
        from ..build import build_index

        n = len(self.state["deltas"])
        delta_dir = os.path.join(self.root, "deltas", f"delta-{n:04d}")
        if source is not None:
            build_index(source, delta_dir, self.cfg)
            self.state["deltas"].append(f"deltas/delta-{n:04d}")
        for repo, path in tombstone_keys or []:
            self.state["tombstones"].append({"repo": repo, "path": path, "after_delta": n})
        self._save()
        self._readers = None
        return delta_dir

    def _save(self) -> None:
        atomic_write_json(self.sync_path, self.state)

    # -- reading ------------------------------------------------------------

    def readers(self) -> list[IndexReader]:
        """Base first, then deltas in application order."""
        if self._readers is None:
            dirs = [os.path.join(self.root, "base")] + [
                os.path.join(self.root, d) for d in self.state["deltas"]
            ]
            self._readers = [IndexReader(d) for d in dirs]
        return self._readers

    def live_map(self) -> list[np.ndarray]:
        """Per-segment boolean mask of live ordinals, applying
        last-write-wins shadowing across segments and tombstones."""
        readers = self.readers()
        seen: set[str] = set()
        tomb: dict[str, int] = {}
        for t in self.state["tombstones"]:
            k = _key(t["repo"], t["path"])
            tomb[k] = max(tomb.get(k, -1), t["after_delta"])
        masks: list[np.ndarray] = [None] * len(readers)  # type: ignore
        # newest segment wins: walk deltas from last to first, base last
        for seg in range(len(readers) - 1, -1, -1):
            meta = readers[seg].docmeta()
            keys = [ _key(r, p) for r, p in zip(meta["repo"], meta["path"]) ]
            mask = np.zeros(len(meta), dtype=bool)
            for i, k in enumerate(keys):
                if k in seen:
                    continue
                seen.add(k)
                # a tombstone issued when n deltas existed (after_delta=n)
                # kills base (seg 0) and deltas j < n (seg j+1 <= n); a
                # later delta re-inserting the key resurrects it
                if k in tomb and tomb[k] >= seg:
                    continue
                mask[i] = True
            masks[seg] = mask
        return masks

    def live_rows(self) -> pd.DataFrame:
        """Merged live doc metadata (for compaction and tests)."""
        out = []
        for rdr, mask in zip(self.readers(), self.live_map()):
            meta = rdr.docmeta()
            sub = meta[mask].copy()
            sub["__segment__"] = rdr.index_dir
            out.append(sub)
        return pd.concat(out, ignore_index=True)

    def search_topk(self, field: str, terms: list[str], k: int = 10) -> pd.DataFrame:
        """Merged disjunctive BM25 top-k across segments with shadowing.

        Per-segment WAND (per-segment df/avgdl stats — the documented
        approximation; compaction restores global-exact scores)."""
        from ..query.wand import wand_topk

        masks = self.live_map()
        rows = []
        for seg, (rdr, mask) in enumerate(zip(self.readers(), masks)):
            hits = wand_topk(rdr, field, terms, k=k + int((~mask).sum()))
            meta = rdr.docmeta()
            for ordinal, score in hits:
                if mask[ordinal]:
                    rows.append(
                        {
                            "doc_id": meta["doc_id"].iloc[ordinal],
                            "repo": meta["repo"].iloc[ordinal],
                            "path": meta["path"].iloc[ordinal],
                            "score": score,
                            "segment": seg,
                        }
                    )
        df = pd.DataFrame(rows)
        if df.empty:
            return df
        return (
            df.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    # -- blocklists (J4, app/jobs/blocked/blocked.go) ------------------------

    def apply_blocklist(
        self,
        claim_ids: list[str] | None = None,
        channels: list[str] | None = None,
    ) -> int:
        """Blocklist deletion: doc-level ids, plus *channel expansion* —
        every live doc of a blocked channel/repo is tombstoned
        (blocked.go:96-141 point deletes; 154-171 publisher expansion).
        Implemented as an anti-join against the broadcast blocked sets.
        Returns the number of tombstones written."""
        blocked_ids = set(claim_ids or [])
        blocked_repos = set(channels or [])
        n = 0
        live = self.live_rows()
        for _i, row in live.iterrows():
            if row["doc_id"] in blocked_ids or row["repo"] in blocked_repos:
                self.state["tombstones"].append(
                    {
                        "repo": row["repo"],
                        "path": row["path"],
                        "after_delta": len(self.state["deltas"]),
                    }
                )
                n += 1
        self._save()
        self._readers = None
        return n

    # -- compaction ---------------------------------------------------------

    def compact(self, new_root: str, cfg: IndexConfig | None = None) -> "IncrementalIndex":
        """Rebuild one canonical index from the merged live rows.

        The result is bit-identical to a from-scratch build over the
        same logical rows (content-addressed partitioning + doc_id
        ranks do not depend on build history)."""
        import ray.data as rd

        live = self.live_rows()
        contents = []
        for _i, row in live.iterrows():
            rdr = next(r for r in self.readers() if r.index_dir == row["__segment__"])
            meta = rdr.docmeta()
            ordinal = int(meta.index[meta["doc_id"] == row["doc_id"]][0])
            contents.append(rdr.doc_content(ordinal))
        tbl = pa.table(
            {
                "repo": pa.array(live["repo"].tolist(), type=pa.string()),
                "path": pa.array(live["path"].tolist(), type=pa.string()),
                "commit": pa.array(live["commit"].tolist(), type=pa.string()),
                "lang": pa.array(live["lang"].tolist(), type=pa.string()),
                "content": pa.array(contents, type=pa.string()),
            }
        )
        out = IncrementalIndex(new_root, cfg or self.cfg)
        out.build_base(rd.from_arrow(tbl), cfg or self.cfg)
        return out
