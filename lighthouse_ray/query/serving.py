"""Serving layer: query actors holding warm segment readers.

The reference serves /search from a process holding a long-lived ES
client (app/app.go:48-53); our analog for a Ray cluster is a pool of
actor replicas, each holding a warm :class:`SearchEngine` (segment
caches, doclens, fuzzy matrices, request TTL cache), fronted by a tiny
round-robin handle.  On a multi-node cluster replicas spread across
nodes (SPREAD scheduling); here they share the single node.

This is the one place raw ``@ray.remote`` is justified instead of a
Dataset op: a query is a low-latency point lookup against shared warm
state, not a batch transform.
"""

from __future__ import annotations

import itertools

import ray


@ray.remote
class SearchReplica:
    def __init__(self, index_dir: str, special_map: dict | None = None):
        from ..index import IndexReader
        from .engine import SearchEngine

        self.engine = SearchEngine(IndexReader(index_dir), special_map=special_map)

    def search(self, **kwargs):
        return self.engine.search(**kwargs)

    def autocomplete(self, **kwargs):
        return self.engine.autocomplete(**kwargs)

    def status(self):
        return self.engine.status()


class SearchService:
    """Round-robin front over N warm replicas."""

    def __init__(self, index_dir: str, num_replicas: int = 2, special_map: dict | None = None):
        self.replicas = [
            SearchReplica.options(scheduling_strategy="SPREAD").remote(index_dir, special_map)
            for _ in range(num_replicas)
        ]
        self._rr = itertools.cycle(range(num_replicas))

    def _pick(self):
        return self.replicas[next(self._rr)]

    def search(self, **kwargs):
        return ray.get(self._pick().search.remote(**kwargs))

    def autocomplete(self, **kwargs):
        return ray.get(self._pick().autocomplete.remote(**kwargs))

    def status(self):
        return ray.get(self._pick().status.remote())

    def shutdown(self):
        for r in self.replicas:
            ray.kill(r)
        self.replicas = []
