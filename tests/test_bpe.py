"""BPE merge training: vectorized primitives vs a pure-Python reference
(subword-nmt semantics: overlap-inclusive pair counts, greedy
left-to-right merge application)."""

import numpy as np
import pyarrow as pa

from lighthouse_ray.functions.bpe import (
    apply_merge_batch,
    bpe_train,
    pair_counts_batch,
    spaced_chars,
)


def _ref_pair_counts(states: list[list[str]], ns: list[int]) -> dict:
    out: dict = {}
    for syms, n in zip(states, ns):
        for a, b in zip(syms, syms[1:]):
            out[(a, b)] = out.get((a, b), 0) + n
    return out


def _ref_apply(syms: list[str], lft: str, rgt: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(words: dict[str, int], t: int):
    states = {w: list(w) for w in words}
    merges = []
    for step in range(1, t + 1):
        cnt = _ref_pair_counts(list(states.values()), [words[w] for w in states])
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        (lft, rgt), c = best
        merges.append((step, lft, rgt, lft + rgt, c))
        states = {w: _ref_apply(s, lft, rgt) for w, s in states.items()}
    return merges, states


def _state_table(words: dict[str, int]) -> pa.Table:
    w = pa.array(list(words), type=pa.string())
    return pa.table(
        {"n": pa.array(list(words.values()), type=pa.int64()), "s": spaced_chars(w)}
    )


WORDS = {
    "aaaa": 3,       # overlap chain: (a,a) candidates at 0,1,2 -> greedy keeps 0,2
    "aaa": 2,        # odd chain: keeps 0 only
    "banana": 4,     # (a,n) repeats without overlap
    "abab": 5,       # alternating, no chain
    "x": 7,          # single symbol: no pairs
    "merge": 1,
    "mergesort": 2,
}


def test_pair_counts_match_reference():
    t = _state_table(WORDS)
    got = pair_counts_batch(t)
    got_map = {
        tuple(p.split(" ", 1)): c
        for p, c in zip(got["pair"].to_pylist(), got["c"].to_pylist())
    }
    ref = _ref_pair_counts([list(w) for w in WORDS], list(WORDS.values()))
    assert got_map == ref


def test_apply_merge_overlap_chains():
    t = _state_table(WORDS)
    out = apply_merge_batch(t, "a", "a")
    got = {s: s.split(" ") for s in out["s"].to_pylist()}
    for w in WORDS:
        ref = _ref_apply(list(w), "a", "a")
        assert got[" ".join(ref)] == ref  # state string round-trips exactly
    # explicit: 'aaaa' -> aa aa; 'aaa' -> aa a
    states = out["s"].to_pylist()
    assert "aa aa" in states and "aa a" in states


def test_apply_merge_multichar_symbols():
    # after merging (a,b)->ab, merging (ab,ab) must align on token
    # boundaries, not raw substrings
    t = pa.table({"n": pa.array([1], type=pa.int64()),
                  "s": pa.array(["ab ab b a b"], type=pa.string())})
    out = apply_merge_batch(t, "ab", "ab")
    assert out["s"].to_pylist() == ["abab b a b"]
    out2 = apply_merge_batch(out, "a", "b")
    assert out2["s"].to_pylist() == ["abab b ab"]


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    words = rd.from_arrow(
        pa.table(
            {
                "word": pa.array(list(WORDS), type=pa.string()),
                "n": pa.array(list(WORDS.values()), type=pa.int64()),
            }
        )
    )
    got = bpe_train(words, 5)
    ref, _states = _ref_bpe(WORDS, 5)
    assert [(m["step"], m["lft"], m["rgt"], m["merged"], m["cnt"]) for m in got] == ref


def test_bpe_train_deterministic_ties(ray_session):
    import ray.data as rd

    # every pair has count 1: argmax must fall to lexicographic (lft, rgt)
    words_d = {"zy": 1, "ba": 1, "ac": 1}
    words = rd.from_arrow(
        pa.table(
            {
                "word": pa.array(list(words_d), type=pa.string()),
                "n": pa.array(list(words_d.values()), type=pa.int64()),
            }
        )
    )
    got = bpe_train(words, 1)
    assert (got[0]["lft"], got[0]["rgt"]) == ("a", "c")
