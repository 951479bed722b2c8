"""Sync watermark checkpoint — the reference's sync-state file.

Mirrors app/jobs/chainquery/chainquery.go:168-207: a JSON file holding
``{start_sync_time, last_sync_time, last_id}`` with the reference's
exact lifecycle (chainquery.go:140-149, 160-166):

- a sync run starts by stamping ``start_sync_time``;
- mid-run checkpoints persist ``last_id`` (keyset cursor) so a killed
  run resumes where it stopped;
- a *completed* run resets ``last_id = 0`` and advances
  ``last_sync_time`` to the run's ``start_sync_time`` (so rows modified
  during the run are re-scanned next time);
- auto-resume: a loaded state with ``last_id != 0`` means a run was in
  flight — callers relaunch immediately instead of waiting the cadence
  (endClaimSync analog).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..util import atomic_write_json, read_json


@dataclass
class SyncState:
    path: str
    start_sync_time: int = 0
    last_sync_time: int = 0
    last_id: int = 0
    extra: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "SyncState":
        if os.path.exists(path):
            d = read_json(path)
            return cls(
                path=path,
                start_sync_time=d.get("start_sync_time", 0),
                last_sync_time=d.get("last_sync_time", 0),
                last_id=d.get("last_id", 0),
                extra=d.get("extra", {}),
            )
        return cls(path=path)

    def save(self) -> None:
        atomic_write_json(
            self.path,
            {
                "start_sync_time": self.start_sync_time,
                "last_sync_time": self.last_sync_time,
                "last_id": self.last_id,
                "extra": self.extra,
            },
        )

    # -- lifecycle ----------------------------------------------------------

    def begin(self, now: int) -> None:
        self.start_sync_time = now
        self.save()

    def checkpoint(self, last_id: int) -> None:
        """Mid-run: persist the keyset cursor (chainquery.go:140-145)."""
        self.last_id = last_id
        self.save()

    def complete(self) -> None:
        """Run finished: reset cursor, advance the watermark
        (chainquery.go:146-149)."""
        self.last_id = 0
        self.last_sync_time = self.start_sync_time
        self.save()

    @property
    def needs_resume(self) -> bool:
        """True when a previous run died mid-sync (chainquery.go:160-166)."""
        return self.last_id != 0
