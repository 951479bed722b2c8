"""Distributed BPE merge training (byte-pair encoding, Sennrich et al.
ACL 2016) over a Ray Data word-frequency table.

The working set is the VOCABULARY (word, n) — derived from the corpus by
one groupby and orders of magnitude smaller than the corpus itself, the
same reduction every production BPE trainer (subword-nmt, HF tokenizers)
relies on.  Each merge iteration is:

1. **pair counting** — one vectorized map over the symbol-state table
   emitting per-batch partial ``(pair, count)`` rows (counts weighted by
   word frequency, all adjacent positions counted — overlapping
   occurrences included, matching subword-nmt's ``get_stats``), folded
   by a small ``groupby('pair').sum()`` shuffle; the argmax pair
   (count desc, left asc, right asc — deterministic) reaches the driver
   as ONE row via ``sort().limit(1)``.
2. **merge application** — the winning pair is captured by value (two
   short strings, no broadcast machinery needed) and applied to every
   word's symbol sequence in one vectorized map: greedy left-to-right
   non-overlapping replacement, exactly subword-nmt's scan.  Overlap
   chains (only possible when left==right, e.g. ``a a a a``) are
   resolved by run-parity selection — kept candidates are the
   even-offset members of each consecutive-candidate run, which IS the
   left-to-right greedy outcome.

The state table is materialized once per iteration (vocabulary-sized
blocks in the object store) so iteration k+1 does not re-execute the
whole lineage of iterations 1..k — the same loop structure as
``clustering.kmeans_fit``.  Nothing corpus- or vocabulary-sized ever
reaches the driver: the driver sees one argmax row per iteration.

Symbol-state representation: a space-joined string per word (symbols
are ``[a-z0-9]+`` by tokenizer construction, so the space separator is
unambiguous).  This exactly matches the SQL oracle's recursive
leftmost-replace formulation (driver gate ``bpe_train``): iterated
leftmost single replacement of `` a b `` with `` ab `` is equivalent to
the one-pass greedy scan because a replacement can never create a new
occurrence of the SAME pair to the left of the scan point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bpe_train", "spaced_chars", "apply_merge_batch", "pair_counts_batch"]


def spaced_chars(words: pa.Array | pa.ChunkedArray) -> pa.Array:
    """word -> initial symbol state: single chars joined by ' '
    (vectorized: regex inserts a space after every char, then the
    trailing space is trimmed; terms are ASCII so chars == bytes)."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    spaced = pc.replace_substring_regex(words, "(.)", r"\1 ")
    return pc.utf8_rtrim(spaced, " ")


def _flat_symbols(state: pa.Array | pa.ChunkedArray):
    """Split the space-joined state column into (flat symbol array,
    per-row symbol counts, parent row index per symbol)."""
    if isinstance(state, pa.ChunkedArray):
        state = state.combine_chunks()
    lst = pc.split_pattern(state, " ")
    flat = lst.flatten()
    off_dtype = np.int64 if pa.types.is_large_list(lst.type) else np.int32
    offs = np.frombuffer(lst.buffers()[1], dtype=off_dtype)[
        lst.offset : lst.offset + len(lst) + 1
    ].astype(np.int64)
    counts = np.diff(offs)
    parents = np.repeat(np.arange(len(lst), dtype=np.int64), counts)
    return flat, counts, parents


def pair_counts_batch(b: pa.Table, state_col: str = "s", n_col: str = "n") -> pa.Table:
    """Per-batch partial pair counts: one row per distinct adjacent
    symbol pair in the batch, weighted by word frequency.  The pair is
    packed as ``lft + ' ' + rgt`` (one groupby key; ' ' sorts below
    every symbol char so packed-lexicographic == (lft, rgt)
    lexicographic, the SQL tie-break)."""
    empty = pa.table({"pair": pa.array([], type=pa.string()),
                      "c": pa.array([], type=pa.int64())})
    if b.num_rows == 0:
        return empty
    flat, _counts, parents = _flat_symbols(b[state_col])
    nf = len(flat)
    if nf < 2:
        return empty
    same = parents[:-1] == parents[1:]
    if not same.any():
        return empty
    n_w = b[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pair = pc.binary_join_element_wise(
        flat.slice(0, nf - 1), flat.slice(1, nf - 1), " "
    ).filter(pa.array(same))
    w = n_w[parents[:-1][same]]
    t = pa.table({"pair": pair, "w": pa.array(w)})
    agg = t.group_by("pair").aggregate([("w", "sum")])
    return pa.table({"pair": agg["pair"], "c": agg["w_sum"].cast(pa.int64())})


def apply_merge_batch(b: pa.Table, lft: str, rgt: str,
                      state_col: str = "s") -> pa.Table:
    """Apply one merge (lft, rgt) -> lft+rgt to every word's symbol
    state in the batch — greedy left-to-right non-overlapping, fully
    vectorized (candidate mask + run-parity overlap resolution + one
    if_else/filter/list-rejoin; no Python loop over words)."""
    flat, counts, parents = _flat_symbols(b[state_col])
    nf = len(flat)
    nrows = b.num_rows
    merged = lft + rgt
    if nf >= 2:
        eq_a = pc.equal(flat, lft).to_numpy(zero_copy_only=False)
        eq_b = pc.equal(flat, rgt).to_numpy(zero_copy_only=False)
        cand = eq_a[:-1] & eq_b[1:] & (parents[:-1] == parents[1:])
        idx = np.flatnonzero(cand)
    else:
        idx = np.array([], dtype=np.int64)
    if len(idx):
        if len(idx) > 1:
            # overlap chains exist only when lft == rgt (e.g. 'a a a a');
            # greedy left-to-right keeps the even-offset members of each
            # consecutive-index run
            run_start = np.empty(len(idx), dtype=bool)
            run_start[0] = True
            np.not_equal(idx[1:], idx[:-1] + 1, out=run_start[1:])
            run_id = np.cumsum(run_start) - 1
            first = idx[np.flatnonzero(run_start)]
            keep = ((idx - first[run_id]) % 2) == 0
            idx = idx[keep]
        drop = idx + 1
        mask_merge = np.zeros(nf, dtype=bool)
        mask_merge[idx] = True
        mask_keep = np.ones(nf, dtype=bool)
        mask_keep[drop] = False
        new_flat = pc.if_else(pa.array(mask_merge), pa.scalar(merged), flat)
        new_flat = new_flat.filter(pa.array(mask_keep))
        new_counts = counts - np.bincount(parents[drop], minlength=nrows)
    else:
        new_flat = flat
        new_counts = counts
    offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(new_counts, out=offs[1:])
    if isinstance(new_flat, pa.ChunkedArray):
        new_flat = new_flat.combine_chunks()
    la = pa.LargeListArray.from_arrays(pa.array(offs, type=pa.int64()), new_flat)
    joined = pc.binary_join(la, " ")
    i = b.column_names.index(state_col)
    return b.set_column(i, state_col, joined.cast(pa.string()))


def bpe_train(words, num_merges: int, word_col: str = "word", n_col: str = "n"):
    """Learn ``num_merges`` BPE merges from a (word, n) frequency
    Dataset.  Returns a list of merge dicts
    ``{step, lft, rgt, merged, cnt}`` (1-based step), the merge table a
    tokenizer applies at encode time."""

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            n_col: b[n_col],
            "s": spaced_chars(b[word_col]),
        })

    state = words.map_batches(init, batch_format="pyarrow").materialize()
    merges = []
    for step in range(1, num_merges + 1):
        from ray.data.aggregate import Sum

        cnt = (
            state.map_batches(
                lambda b: pair_counts_batch(b, "s", n_col), batch_format="pyarrow"
            )
            .groupby("pair")
            .aggregate(Sum("c", alias_name="c"))
        )
        best = cnt.sort(["c", "pair"], descending=[True, False]).limit(1).take_all()
        if not best:
            break
        pair = best[0]["pair"]
        c = int(best[0]["c"])
        lft, rgt = pair.split(" ", 1)
        merges.append(
            {"step": step, "lft": lft, "rgt": rgt, "merged": lft + rgt, "cnt": c}
        )
        state = state.map_batches(
            lambda b, _l=lft, _r=rgt: apply_merge_batch(b, _l, _r, "s"),
            batch_format="pyarrow",
        ).materialize()
    return merges
