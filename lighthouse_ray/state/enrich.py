"""Doc-value enrichment: the view/sub-count partial-update jobs.

Mirrors app/jobs/internalapis (views.go / subs.go): an external counts
source keyed by doc id is joined to the index and only the matched,
positive counts are written back (views.go:91-93, subs.go:98-100 —
``only >0 written``); the write is a *partial update* of doc-values,
leaving postings untouched (ES BulkUpdateRequest partial-doc analog).

Ray shape: the counts table is the small side — broadcast it and
rewrite only the doc-store partitions that contain matched docs
(partition-level partial rewrite; postings/segments unchanged).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..util import atomic_write_bytes

ENRICHABLE = ("view_cnt", "sub_cnt")


def enrich_counts(index_dir: str, counts: pa.Table, id_col: str = "doc_id") -> dict:
    """Apply partial doc-value updates from ``counts`` (columns: doc_id +
    any of view_cnt / sub_cnt).  Returns {part: n_updated}.

    Only positive counts are applied (views.go:83-90 analog).  Each
    affected doc-store part file is rewritten atomically; unmatched
    parts are untouched, so the update cost scales with the matched
    partitions, not the index size.
    """
    cols = [c for c in ENRICHABLE if c in counts.column_names]
    if not cols:
        raise ValueError(f"counts table must carry one of {ENRICHABLE}")
    lut: dict[str, dict[str, int]] = {}
    for row in counts.to_pylist():
        updates = {c: int(row[c]) for c in cols if row.get(c) is not None and int(row[c]) > 0}
        if updates:
            lut[row[id_col]] = updates

    docstore = os.path.join(index_dir, "docstore")
    out: dict[int, int] = {}
    for fname in sorted(os.listdir(docstore)):
        if not fname.endswith(".parquet"):
            continue
        path = os.path.join(docstore, fname)
        t = pq.read_table(path)
        ids = t["doc_id"].to_pylist()
        hit_rows = [i for i, d in enumerate(ids) if d in lut]
        if not hit_rows:
            continue
        arrays = {c: t[c].to_numpy(zero_copy_only=False).copy() for c in cols}
        for i in hit_rows:
            for c, v in lut[ids[i]].items():
                arrays[c][i] = v
        for c in cols:
            t = t.set_column(t.column_names.index(c), c, pa.array(arrays[c], type=pa.int64()))
        sink = pa.BufferOutputStream()
        pq.write_table(t, sink, compression="zstd")
        atomic_write_bytes(path, sink.getvalue().to_pybytes())
        part = int(fname.split("-")[1].split(".")[0])
        out[part] = len(hit_rows)
    return out
