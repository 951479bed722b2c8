"""Posting construction: tokenize stage, term sharding, shuffle-merge.

Stage B (SPIMI analog of the reference's ES bulk indexing,
app/jobs/chainquery/chainquery.go:94 + ES-internal analysis): a
stateful ``map_batches`` actor tokenizes each doc-store batch into flat
posting rows ``(field, term, ordinal, tf, pos_blob, shard)``.  Every
per-batch step is vectorized (pyarrow RE2 kernels + numpy); positions
are delta+varbyte encoded per (doc, term) already at this stage, so the
merge step just concatenates blobs.

Doc-length rows ride along in the same output with ``term=''`` (the
empty term can never be produced by the tokenizer) and ``shard=-1`` —
a document's content lives in exactly one input row, so its doclen is
exact per batch, and no extra tokenize or shuffle pass is needed.

Stage D: ``groupby('shard').map_groups(merge_shard)`` sorts each
shard's rows by (field, term, ordinal), run-length-groups them into per
-term posting lists, delta+varbyte-compresses ordinals/tfs, builds
block-max metadata (last ordinal + max tf per 128-posting block), and
writes one atomic parquet segment per shard.

Hot-term skew (SURVEY.md §4): terms whose sampled df exceeds
``hot_df_ratio * N`` are salted — their postings are split by ordinal
range (``salt_range`` docs per bucket) and each bucket is routed to
``stable_hash64(f"{term}#{bucket}") % S``.  The reader reconstructs the
full list by concatenating buckets in order (ranges are disjoint and
increasing, so no re-sort).  The hot set is stored in stats.json.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import flat_tokens
from ..codecs import (
    position_gaps,
    varbyte_encode,
    varbyte_sizes,
)
from ..config import FIELDS, IndexConfig
from ..util import atomic_write_bytes, stable_hash64

# doc-store column feeding each indexed field
FIELD_SOURCE = {"name": "name", "title": "path", "channel": "repo", "content": "content"}

POSTINGS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("ordinal", pa.int64()),
        ("tf", pa.int32()),
        ("pos_blob", pa.large_binary()),
        ("shard", pa.int32()),
    ]
)


class TokenizerStage:
    """Actor-pool tokenize stage: state (offsets, hot set, salt memo)
    built once per actor in ``__init__``, per-batch work in ``__call__``."""

    def __init__(self, offsets: list[int], hot_terms: list[str], cfg_json: dict):
        self.cfg = IndexConfig.from_json(cfg_json)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.hot = set(hot_terms)
        self._shard_memo: dict[str, int] = {}
        self._salt_memo: dict[tuple[str, int], int] = {}

    def _term_shard(self, term: str) -> int:
        s = self._shard_memo.get(term)
        if s is None:
            s = stable_hash64(term) % self.cfg.num_term_shards
            self._shard_memo[term] = s
        return s

    def _salt_shard(self, term: str, bucket: int) -> int:
        key = (term, bucket)
        s = self._salt_memo.get(key)
        if s is None:
            s = stable_hash64(f"{term}#{bucket}") % self.cfg.num_term_shards
            self._salt_memo[key] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ordinals = (
            self.offsets[batch["part"].to_numpy(zero_copy_only=False)]
            + batch["rank"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        pieces = [self._field_postings(batch, f, ordinals) for f in FIELDS]
        pieces.append(self._doclen_rows(pieces))
        return pa.concat_tables([p for p in pieces if p is not None])

    # -- per-field vectorized posting construction ------------------------

    def _field_postings(self, batch: pa.Table, field: str, ordinals: np.ndarray):
        col = batch[FIELD_SOURCE[field]]
        parents, pos, terms, _n = flat_tokens(col)
        if len(parents) == 0:
            return pa.table(
                {k: pa.array([], type=t) for k, t in zip(POSTINGS_SCHEMA.names, POSTINGS_SCHEMA.types)}
            )
        ords = ordinals[parents]
        tcodes_arr = terms.dictionary_encode()
        tcodes = tcodes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_terms = tcodes_arr.dictionary.to_pylist()

        order = np.lexsort((pos, tcodes, ords))
        ords_s, tcodes_s, pos_s = ords[order], tcodes[order], pos[order]

        # run boundaries: change of (ordinal, term)
        change = np.empty(len(ords_s), dtype=bool)
        change[0] = True
        np.logical_or(
            ords_s[1:] != ords_s[:-1], tcodes_s[1:] != tcodes_s[:-1], out=change[1:]
        )
        starts = np.flatnonzero(change)
        tfs = np.diff(np.append(starts, len(ords_s))).astype(np.int64)

        run_ords = ords_s[starts]
        run_codes = tcodes_s[starts]

        # encode all positions in one shot; slice per run via byte offsets
        gaps = position_gaps(pos_s.astype(np.uint64), tfs)
        blob = varbyte_encode(gaps)
        nb = varbyte_sizes(gaps)
        byte_ends = np.cumsum(nb)
        run_byte_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        run_byte_offsets[1:] = byte_ends[np.append(starts[1:], len(nb)) - 1]
        pos_col = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(starts),
            [None, pa.py_buffer(run_byte_offsets.tobytes()), pa.py_buffer(blob)],
        )

        # shard per run (salt hot terms by ordinal range)
        base_shard = np.empty(len(uniq_terms), dtype=np.int32)
        hot_mask_code = np.zeros(len(uniq_terms), dtype=bool)
        for c, t in enumerate(uniq_terms):
            base_shard[c] = self._term_shard(t)
            if t in self.hot:
                hot_mask_code[c] = True
        shard = base_shard[run_codes]
        hot_runs = np.flatnonzero(hot_mask_code[run_codes])
        salted_terms: dict[int, str] | None = None
        if len(hot_runs):
            buckets = run_ords[hot_runs] // self.cfg.salt_range
            shard = shard.copy()
            # salted postings are stored under a distinct key
            # "term\x01bucket" so two buckets landing in the same shard
            # stay separate rows (the reader re-concatenates by bucket)
            salted_terms = {}
            for i, b in zip(hot_runs, buckets):
                t = uniq_terms[run_codes[i]]
                shard[i] = self._salt_shard(t, int(b))
                salted_terms[int(i)] = f"{t}\x01{int(b)}"

        if salted_terms:
            term_list = [uniq_terms[c] for c in run_codes]
            for i, st in salted_terms.items():
                term_list[i] = st
            term_col = pa.array(term_list, type=pa.string())
        else:
            term_col = pc.take(pa.array(uniq_terms, type=pa.string()), pa.array(run_codes))
        return pa.table(
            {
                "field": pa.array([field] * len(starts), type=pa.string()),
                "term": term_col,
                "ordinal": pa.array(run_ords, type=pa.int64()),
                "tf": pa.array(tfs.astype(np.int32)),
                "pos_blob": pos_col,
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    def _doclen_rows(self, field_tables: list[pa.Table]):
        """One row per (field, doc): term='', tf=doclen, shard=-1."""
        outs = []
        for ft in field_tables:
            if ft is None or ft.num_rows == 0:
                continue
            agg = (
                ft.select(["field", "ordinal", "tf"])
                .group_by(["field", "ordinal"])
                .aggregate([("tf", "sum")])
            )
            n = agg.num_rows
            outs.append(
                pa.table(
                    {
                        "field": agg["field"],
                        "term": pa.array([""] * n, type=pa.string()),
                        "ordinal": agg["ordinal"],
                        "tf": agg["tf_sum"].cast(pa.int32()),
                        "pos_blob": pa.array([b""] * n, type=pa.large_binary()),
                        "shard": pa.array(np.full(n, -1, dtype=np.int32)),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else None


# ---------------------------------------------------------------------------
# Stage D: shard merge
# ---------------------------------------------------------------------------

SEGMENT_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("ords", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("pos", pa.large_binary()),
        ("blk_last", pa.large_binary()),   # uint64 LE per block: last ordinal
        ("blk_maxtf", pa.large_binary()),  # uint32 LE per block: max tf
    ]
)


def make_merge_shard(index_dir: str, cfg: IndexConfig):
    block = cfg.block_size

    def merge_shard(group: pa.Table) -> pa.Table:
        shard = group["shard"][0].as_py()
        idx = pc.sort_indices(
            group,
            sort_keys=[("field", "ascending"), ("term", "ascending"), ("ordinal", "ascending")],
        )
        g = group.take(idx)
        fields = g["field"].to_pylist()
        terms = g["term"].to_pylist()
        ords = g["ordinal"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tfs = g["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        blobs = g["pos_blob"].to_pylist()

        n = len(terms)
        fcodes = g["field"].combine_chunks().dictionary_encode().indices.to_numpy(zero_copy_only=False)
        tcodes = g["term"].combine_chunks().dictionary_encode().indices.to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.logical_or(fcodes[1:] != fcodes[:-1], tcodes[1:] != tcodes[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)

        out = {k: [] for k in SEGMENT_SCHEMA.names}
        n_postings = 0
        for s, e in zip(starts, ends):
            o = ords[s:e]
            t = tfs[s:e]
            n_postings += len(o)
            out["field"].append(fields[s])
            out["term"].append(terms[s])
            out["df"].append(int(e - s))
            out["cf"].append(int(t.sum()))
            out["ords"].append(varbyte_encode(np.diff(o, prepend=np.uint64(0))))
            out["tfs"].append(varbyte_encode(t))
            out["pos"].append(b"".join(blobs[s:e]))
            lasts = np.append(o[block - 1 :: block], o[-1]) if (e - s) % block else o[block - 1 :: block]
            out["blk_last"].append(np.ascontiguousarray(lasts, dtype=np.uint64).tobytes())
            nb_blocks = len(lasts)
            pad = nb_blocks * block - (e - s)
            tpad = np.append(t, np.zeros(pad, dtype=np.uint64)).reshape(nb_blocks, block)
            out["blk_maxtf"].append(tpad.max(axis=1).astype(np.uint32).tobytes())

        seg = pa.table({k: pa.array(v, type=ty) for (k, ty), v in zip(zip(SEGMENT_SCHEMA.names, SEGMENT_SCHEMA.types), out.values())})
        sink = pa.BufferOutputStream()
        pq.write_table(seg, sink, compression="zstd")
        data = sink.getvalue().to_pybytes()
        atomic_write_bytes(os.path.join(index_dir, "segments", f"shard-{shard:05d}.parquet"), data)
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int32()),
                "n_terms": pa.array([len(starts)], type=pa.int64()),
                "n_postings": pa.array([n_postings], type=pa.int64()),
                "bytes": pa.array([len(data)], type=pa.int64()),
                "sha256": pa.array([hashlib.sha256(data).hexdigest()], type=pa.string()),
            }
        )

    return merge_shard
