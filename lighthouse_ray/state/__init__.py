from .alias import AliasError, AliasStore, reindex_swap
from .checkpoint import SyncState
from .incremental import IncrementalIndex
from .sync_daemon import SyncDaemon, SyncKilled, sync_once

__all__ = [
    "AliasError", "AliasStore", "IncrementalIndex", "SyncState", "reindex_swap",
]
