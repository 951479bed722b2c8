"""Index aliases: the ES alias API analog (zero-downtime reindex).

The reference's backend serves one logical index name whose physical
index is swapped out-of-band when the schema or analyzer changes (the
standard ES reindex-then-swap-alias operation).  Here an alias store is
one ``aliases.json`` file mapping alias → physical index directory,
written atomically (tmp + rename) so a resolve never observes a torn
file: a reader resolving mid-swap sees either the old or the new index,
never a mixture.

Serving semantics: ``IndexReader`` holds its physical directory for its
whole lifetime, so in-flight queries on the OLD index finish unaffected
by a swap; new ``resolve()`` calls route to the new index.  A sharded
service rolls over by constructing new replicas against the resolved
directory and retiring the old pool — the alias flip is the only
coordination point, O(1) regardless of corpus size.

``reindex_swap`` is the composed operation: build the new physical
index from a corpus Dataset (full distributed build — tokenize, spill
exchange, merge), then flip the alias.  The build runs entirely against
the NEW directory; queries against the alias keep hitting the old index
until the single atomic rename.
"""

from __future__ import annotations

import json
import os

from ..util import atomic_write_bytes

ALIAS_FILE = "aliases.json"


class AliasError(RuntimeError):
    pass


class AliasStore:
    """Atomic alias → index-directory map persisted at
    ``<root>/aliases.json``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, ALIAS_FILE)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def aliases(self) -> dict:
        """Snapshot of the full alias map (copy; mutations don't write)."""
        return dict(self._load())

    def set(self, alias: str, index_dir: str) -> str | None:
        """Point ``alias`` at ``index_dir`` (must be a built index —
        its stats.json must exist).  Returns the previous target (None
        if the alias is new).  The write is atomic: concurrent readers
        see the old or the new map, never a torn file."""
        if not os.path.exists(os.path.join(index_dir, "stats.json")):
            raise AliasError(f"not a built index (stats.json missing): {index_dir}")
        m = self._load()
        prev = m.get(alias)
        m[alias] = os.path.abspath(index_dir)
        atomic_write_bytes(self.path, json.dumps(m, indent=1, sort_keys=True).encode())
        return prev

    def delete(self, alias: str) -> None:
        m = self._load()
        if alias not in m:
            raise AliasError(f"unknown alias: {alias}")
        del m[alias]
        atomic_write_bytes(self.path, json.dumps(m, indent=1, sort_keys=True).encode())

    def resolve(self, alias: str) -> str:
        m = self._load()
        if alias not in m:
            raise AliasError(f"unknown alias: {alias}")
        return m[alias]

    def open_reader(self, alias: str):
        """IndexReader over the alias's CURRENT target.  The reader
        pins the physical directory: a later swap does not affect it."""
        from ..index import IndexReader

        return IndexReader(self.resolve(alias))


def reindex_swap(store: AliasStore, alias: str, corpus, new_dir: str, cfg) -> str | None:
    """Zero-downtime reindex: build a NEW physical index from ``corpus``
    at ``new_dir`` (the full distributed build), then atomically flip
    ``alias`` to it.  Returns the previous physical directory (the
    caller decides when to GC it — typically after draining readers).
    Queries resolving through the alias see the old index for the whole
    build and the new one after the single atomic rename."""
    from ..build import build_index

    build_index(corpus, new_dir, cfg)
    return store.set(alias, new_dir)
