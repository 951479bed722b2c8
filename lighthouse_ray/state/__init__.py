from .alias import AliasError, AliasStore, reindex_swap
from .checkpoint import SyncState
from .incremental import IncrementalIndex

__all__ = [
    "AliasError", "AliasStore", "IncrementalIndex", "SyncState", "reindex_swap",
]
