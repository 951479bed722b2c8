"""Weighted completion index (VERDICT r4 missing item 2): top-k-by-
weight prefix completion in O(|prefix| + k log n) — conformance with
the brute-force (weight desc, value asc) ranking, ties, edge cases."""

import random

import numpy as np
import pytest

from lighthouse_ray.index.suggest import WeightedCompleter


def _brute(values, weights, prefix, k):
    cand = [(v, w) for v, w in zip(values, weights) if v.startswith(prefix)]
    cand.sort(key=lambda t: (-t[1], t[0]))
    return cand[:k]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_completer_matches_bruteforce(seed):
    rng = random.Random(seed)
    alpha = "abcdef"
    vals = sorted({"".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
                   for _ in range(3000)})
    w = [rng.randint(0, 50) for _ in vals]  # heavy ties
    c = WeightedCompleter(np.asarray(vals, dtype=object), np.asarray(w))
    wmap = dict(zip(c.values.tolist(), c.weights.tolist()))
    for prefix in ["", "a", "ab", "abc", "fff", "zzz", vals[17][:2]]:
        for k in (1, 5, 100):
            got = c.complete(prefix, k)
            want = _brute(list(wmap), list(wmap.values()), prefix, k)
            assert got == want, (prefix, k, got[:3], want[:3])


def test_completer_edges():
    c = WeightedCompleter(np.asarray(["x"], dtype=object), np.asarray([7]))
    assert c.complete("x", 5) == [("x", 7)]
    assert c.complete("y", 5) == []
    assert c.complete("x", 0) == []
    empty = WeightedCompleter(np.asarray([], dtype=object), np.asarray([], dtype=np.int64))
    assert empty.complete("a", 3) == []


def test_completer_sublinear_vs_scan():
    """A hot one-char prefix over a big vocabulary: the heap-split must
    touch ~k log n entries, not the whole range — assert output parity
    AND that it beats the O(range) lexsort wall by a wide margin."""
    import time

    rng = random.Random(9)
    n = 400_000
    vals = sorted({"a" + "".join(rng.choice("abcdefghij") for _ in range(8))
                   for _ in range(n)})
    w = np.asarray([rng.randint(0, 10**6) for _ in vals])
    va = np.asarray(vals, dtype=object)
    c = WeightedCompleter(va, w)

    t0 = time.time()
    for _ in range(50):
        got = c.complete("a", 5)
    t_idx = time.time() - t0

    t0 = time.time()
    for _ in range(50):
        order = np.lexsort((c.values, -c.weights))[:5]
        want = [(str(c.values[i]), int(c.weights[i])) for i in order]
    t_scan = time.time() - t0

    assert got == want
    assert t_idx < t_scan / 5, (t_idx, t_scan)
