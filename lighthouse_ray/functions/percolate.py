"""Percolator — reverse search (the ES percolate query): match a STREAM
of documents against a registry of STORED queries at ingest time — the
routing/alerting primitive of a training-data pipeline (e.g. "tag every
incoming doc that matches any curation watchlist query").

Distributed shape: the stored queries are the SMALL side — compiled
once per actor in ``__init__`` (term vocabulary + per-query term index
lists), documents stream through ``map_batches`` and are tokenized once
per batch; per-query matching is a boolean matrix reduction, no Python
loop over rows.  Query semantics are analyzed term sets with
``minimum_should_match`` (``min_match == len(terms)`` is bool.must),
exactly mirrorable in SQL over the same tokenizer — the gate's oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import flat_tokens, tokenize_text

OUT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("doc_id", pa.int64()),
        ("n_matched", pa.int64()),
    ]
)


class PercolateStage:
    """Actor-pool stage: compile the stored queries once, percolate
    every batch.

    ``queries``: list of ``(query_id, query_text, min_match)``;
    ``min_match=None`` means ALL terms (bool.must).  Query text runs
    through the SAME analyzer as documents (the ES contract)."""

    def __init__(self, queries: list[tuple], text_col: str = "text",
                 id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        compiled = []
        vocab: dict[str, int] = {}
        for qid, qtext, min_match in queries:
            terms = sorted(set(tokenize_text(qtext)))
            if not terms:
                continue
            idxs = []
            for t in terms:
                if t not in vocab:
                    vocab[t] = len(vocab)
                idxs.append(vocab[t])
            need = len(terms) if min_match is None else int(min_match)
            compiled.append((str(qid), np.asarray(idxs, dtype=np.int64),
                             max(1, need)))
        self.compiled = compiled
        self.vocab = pa.array(sorted(vocab, key=vocab.get), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or not self.compiled:
            return OUT_SCHEMA.empty_table()
        parents, _pos, terms, n_rows = flat_tokens(batch[self.text_col])
        # project the token stream onto the query vocabulary (everything
        # else is irrelevant), then scatter a docs x |vocab| presence
        # matrix — one pass, no per-row Python
        vi = pc.index_in(terms, value_set=self.vocab)
        ok = pc.is_valid(vi)
        pidx = parents[ok.to_numpy(zero_copy_only=False)]
        vidx = vi.filter(ok).to_numpy(zero_copy_only=False).astype(np.int64)
        present = np.zeros((n_rows, len(self.vocab)), dtype=bool)
        present[pidx, vidx] = True
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_d, out_n = [], [], []
        for qid, idxs, need in self.compiled:
            cnt = present[:, idxs].sum(axis=1)
            hit = np.flatnonzero(cnt >= need)
            if len(hit):
                out_q.append(np.full(len(hit), qid, dtype=object))
                out_d.append(ids[hit])
                out_n.append(cnt[hit].astype(np.int64))
        if not out_q:
            return OUT_SCHEMA.empty_table()
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.string()),
            "doc_id": pa.array(np.concatenate(out_d)),
            "n_matched": pa.array(np.concatenate(out_n)),
        })


def percolate(ds, queries: list[tuple], text_col: str = "text",
              id_col: str = "doc_id", concurrency=(1, 4)):
    """Percolate a document Dataset against stored queries; returns a
    Dataset of (query_id, doc_id, n_matched) matches."""
    return ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={"queries": queries, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
