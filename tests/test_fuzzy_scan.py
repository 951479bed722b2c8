"""fuzzy_candidates conformance: the banded / width-clamped / early-abandon
vectorized DP must agree exactly with a brute-force Levenshtein over
randomized vocabularies (all terms [a-z0-9] by tokenizer construction)."""

import random

import numpy as np
import pytest


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


class _FakeReader:
    """Borrow IndexReader.fuzzy_candidates/field_dictionary unbound, backed
    by an in-memory vocabulary (no index on disk needed)."""

    def __init__(self, vocab):
        self._dictionary = {"content": np.unique(np.asarray(vocab, dtype=object))}

    def field_dictionary(self, field):
        return self._dictionary[field]

    def _fuzzy_scan_state(self, field):
        from lighthouse_ray.index.reader import IndexReader

        return IndexReader._fuzzy_scan_state(self, field)

    def _trigram_index(self, field):
        from lighthouse_ray.index.reader import IndexReader

        return IndexReader._trigram_index(self, field)

    def fuzzy_candidates(self, field, term, maxd):
        from lighthouse_ray.index.reader import IndexReader

        return IndexReader.fuzzy_candidates(self, field, term, maxd)


ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzzy_matches_bruteforce(seed):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice(ALPHA) for _ in range(rng.randint(1, 12)))
        for _ in range(4000)
    ]
    r = _FakeReader(vocab)
    d = r.field_dictionary("content")
    for q in ["merge", "mrege", "x", "abcdefghijkl", "a1b2", vocab[7], vocab[99][:4]]:
        for maxd in (0, 1, 2):
            got = r.fuzzy_candidates("content", q, maxd)
            want = [t for t in d if _lev(q, t) <= maxd]
            assert got == want, (q, maxd, got[:5], want[:5])


def test_fuzzy_early_abandon_path():
    """>4096 candidates of the same length forces the compaction branch."""
    rng = random.Random(9)
    base = "abcdefgh"
    vocab = {base}
    while len(vocab) < 9000:
        s = list(base)
        for _ in range(rng.randint(1, 4)):
            s[rng.randrange(len(s))] = rng.choice(ALPHA)
        vocab.add("".join(s))
    r = _FakeReader(sorted(vocab))
    d = r.field_dictionary("content")
    got = r.fuzzy_candidates("content", base, 2)
    want = [t for t in d if _lev(base, t) <= 2]
    assert got == want and base in got


def test_fuzzy_empty_term_and_tiny_vocab():
    r = _FakeReader(["a", "ab", "abc"])
    assert r.fuzzy_candidates("content", "", 1) == ["a"]
    assert r.fuzzy_candidates("content", "", 2) == ["a", "ab"]
    assert r.fuzzy_candidates("content", "zzzz", 0) == []


def test_fuzzy_trigram_prefilter_conformance():
    """Long query terms route through the trigram q-gram prefilter
    (n - 2 - 3*maxd >= 1); results must still equal brute force exactly
    — the q-gram count bound is a true lower bound."""
    rng = random.Random(21)
    vocab = set()
    base_terms = ["tokenizerstage", "spillexchange", "minorcompaction",
                  "fuzzycandidates", "triangularmatrix"]
    for b in base_terms:
        vocab.add(b)
        for _ in range(200):
            s = list(b)
            for _ in range(rng.randint(1, 3)):
                op = rng.randrange(3)
                p = rng.randrange(len(s))
                if op == 0:
                    s[p] = rng.choice(ALPHA)
                elif op == 1 and len(s) > 4:
                    del s[p]
                else:
                    s.insert(p, rng.choice(ALPHA))
            vocab.add("".join(s))
    # unrelated noise terms of similar lengths
    for _ in range(3000):
        vocab.add("".join(rng.choice(ALPHA) for _ in range(rng.randint(10, 18))))
    r = _FakeReader(sorted(vocab))
    d = r.field_dictionary("content")
    for q in base_terms + ["tokenizrestage", "spilexchange", "fuzzycandidatez"]:
        for maxd in (1, 2):
            assert len(q) - 2 - 3 * maxd >= 1  # trigram path active
            got = r.fuzzy_candidates("content", q, maxd)
            want = [t for t in d if _lev(q, t) <= maxd]
            assert got == want, (q, maxd)


def test_fuzzy_trigram_repeated_grams_safe():
    """Repeated query trigrams must not over-prune (the searchsorted
    count OVERcounts shared grams, which is the safe direction)."""
    vocab = ["aaaaaaaaaaa", "aaaaaaaaaab", "aaaaabaaaaa", "bbbbbbbbbbb"]
    r = _FakeReader(vocab)
    got = r.fuzzy_candidates("content", "aaaaaaaaaaa", 2)
    want = [t for t in sorted(set(vocab)) if _lev("aaaaaaaaaaa", t) <= 2]
    assert got == want
