from .checkpoint import SyncState
from .incremental import IncrementalIndex

__all__ = ["SyncState", "IncrementalIndex"]
