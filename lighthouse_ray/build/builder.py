"""Index build orchestration: the end-to-end Ray Data pipeline.

Stages (SURVEY.md §7.1), each checkpointed in ``manifest.json`` so a
killed build resumes from the last completed stage (segments resume
per-shard — the mid-shuffle resume of fixture x02):

  A. docstore  — derive identity/doc-values → groupby(part) →
                 dedup/delete-route/rank → per-part parquet + lineage
  H. hot terms — deterministic 1/df_sample_mod doc sample → df estimate
                 → hot set (salting decisions, data- not
                 parallelism-dependent)
  B. postings  — TokenizerStage actor pool → flat posting rows parquet
                 (the SPIMI spill / shuffle input checkpoint)
  C. stats     — doclen rows (shard == -1) → avgdl per field
  D. segments  — groupby(shard).map_groups(merge) → compressed segment
                 parquet per shard (skips shards already in manifest)

The caller owns the Ray session; this module never calls ray.init.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..analysis import flat_tokens
from ..config import FIELDS, IndexConfig
from ..util import atomic_write_json, read_json
from .docs import derive_batch, make_finalize_part, part_offsets
from .postings import TokenizerStage, make_merge_shard


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    n_postings: int
    manifest: dict


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def _load_manifest(index_dir: str) -> dict:
    p = _manifest_path(index_dir)
    if os.path.exists(p):
        return read_json(p)
    return {"stages": {}}


def build_index(
    source,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
) -> BuildResult:
    """Build (or resume) an index at ``index_dir``.

    ``source`` is a parquet path/list or a ``ray.data.Dataset`` with
    columns (repo, path, commit, lang, content).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    manifest = _load_manifest(index_dir) if resume else {"stages": {}}
    if not resume:
        for sub in ("docstore", "postings", "segments"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    manifest.setdefault("config", cfg.to_json())
    stages = manifest["stages"]

    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)

    # ---- Stage A: docstore ------------------------------------------------
    if "docstore" not in stages:
        t0 = time.time()
        rows = (
            ds.map_batches(lambda b: derive_batch(b, cfg), batch_format="pyarrow")
            .groupby("part")
            .map_groups(make_finalize_part(index_dir, cfg), batch_format="pyarrow")
            .take_all()
        )  # one small manifest row per partition
        part_rows = {int(r["part"]): int(r["rows"]) for r in rows}
        stages["docstore"] = {
            "sec": round(time.time() - t0, 3),
            "part_rows": {str(k): v for k, v in sorted(part_rows.items())},
            "input_rows": int(sum(r["input_rows"] for r in rows)),
            "deleted": int(sum(r["deleted"] for r in rows)),
            "digests": {str(int(r["part"])): r["digest"] for r in rows},
            "lineage": {"source": str(source) if not isinstance(source, rd.Dataset) else "<dataset>"},
        }
        atomic_write_json(_manifest_path(index_dir), manifest)

    part_rows = {int(k): v for k, v in stages["docstore"]["part_rows"].items()}
    offsets = part_offsets(part_rows, cfg.num_doc_parts)
    n_docs = sum(part_rows.values())

    docstore_paths = [
        os.path.join(index_dir, "docstore", f"part-{p:05d}.parquet")
        for p in sorted(part_rows)
        if part_rows[p] > 0
    ]

    # ---- Stage H: hot-term estimate ----------------------------------------
    if "hot_terms" not in stages:
        t0 = time.time()
        mod = cfg.df_sample_mod
        sample = rd.read_parquet(docstore_paths, columns=["rank", "content"]).map_batches(
            lambda b: _sample_df_partial(b, mod), batch_format="pyarrow"
        )
        agg = sample.groupby("term").aggregate(Sum("n", alias_name="n_docs"))
        thresh = max(4.0, cfg.hot_df_ratio * n_docs / mod)
        hot = [
            r["term"]
            for r in agg.take_all()
            if r["n_docs"] >= thresh
        ]
        stages["hot_terms"] = {"sec": round(time.time() - t0, 3), "terms": sorted(hot), "threshold": thresh}
        atomic_write_json(_manifest_path(index_dir), manifest)
    hot_terms = stages["hot_terms"]["terms"]

    # ---- Stage B: postings --------------------------------------------------
    postings_dir = os.path.join(index_dir, "postings")
    if "postings" not in stages:
        t0 = time.time()
        shutil.rmtree(postings_dir, ignore_errors=True)
        docstore = rd.read_parquet(
            docstore_paths, columns=["part", "rank", "name", "path", "repo", "content"]
        )
        import ray as _ray

        concurrency = cfg.tokenize_concurrency or max(
            2, int(_ray.cluster_resources().get("CPU", 4)) - 1
        )
        postings = docstore.map_batches(
            TokenizerStage,
            fn_constructor_kwargs={
                "offsets": offsets,
                "hot_terms": hot_terms,
                "cfg_json": cfg.to_json(),
            },
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            concurrency=concurrency,
        )
        postings.write_parquet(postings_dir)
        stages["postings"] = {"sec": round(time.time() - t0, 3)}
        atomic_write_json(_manifest_path(index_dir), manifest)

    # ---- Stage C: collection stats (doclen rows: shard == -1) ---------------
    if "stats" not in stages:
        t0 = time.time()
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        dl = rd.read_parquet(
            postings_dir,
            columns=["field", "tf"],
            filter=(pads.field("shard") == -1),
        )
        agg = dl.groupby("field").aggregate(Sum("tf", alias_name="total"), Count(alias_name="n"))
        field_stats = {
            r["field"]: {"total_len": int(r["total"]), "n_docs_with": int(r["n"])}
            for r in agg.take_all()
        }
        stats = {
            "n_docs": n_docs,
            "fields": {
                f: {
                    **field_stats.get(f, {"total_len": 0, "n_docs_with": 0}),
                    "avgdl": (field_stats.get(f, {}).get("total_len", 0) / n_docs) if n_docs else 0.0,
                }
                for f in FIELDS
            },
            "hot_terms": hot_terms,
            "salt_range": cfg.salt_range,
            "num_term_shards": cfg.num_term_shards,
            "num_doc_parts": cfg.num_doc_parts,
            "part_offsets": offsets,
            "k1": cfg.k1,
            "b": cfg.b,
            "now_ts": cfg.now_ts,
        }
        atomic_write_json(os.path.join(index_dir, "stats.json"), stats)
        stages["stats"] = {"sec": round(time.time() - t0, 3)}
        atomic_write_json(_manifest_path(index_dir), manifest)

    # ---- Stage D: segments ----------------------------------------------------
    seg_done: dict = stages.get("segments", {}).get("shards", {})
    t0 = time.time()
    import pyarrow.dataset as pads

    flt = pads.field("shard") >= 0
    done_ids = sorted(int(k) for k in seg_done)
    post = rd.read_parquet(postings_dir, filter=flt)
    if done_ids:
        done_arr = set(done_ids)
        post = post.map_batches(
            lambda b: b.filter(
                pa.array([s not in done_arr for s in b["shard"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
    seg_rows = (
        post.groupby("shard")
        .map_groups(make_merge_shard(index_dir, cfg), batch_format="pyarrow")
        .take_all()
    )
    for r in seg_rows:
        seg_done[str(int(r["shard"]))] = {
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "bytes": int(r["bytes"]),
            "sha256": r["sha256"],
        }
    stages["segments"] = {
        "sec": round(time.time() - t0, 3) + stages.get("segments", {}).get("sec", 0.0),
        "shards": seg_done,
    }
    manifest["n_docs"] = n_docs
    atomic_write_json(_manifest_path(index_dir), manifest)

    n_postings = sum(v["n_postings"] for v in seg_done.values())
    return BuildResult(index_dir=index_dir, n_docs=n_docs, n_postings=n_postings, manifest=manifest)


def _sample_df_partial(batch: pa.Table, mod: int) -> pa.Table:
    """Per-batch partial df counts over a deterministic 1/mod doc sample."""
    keep = batch.filter(
        pa.array((batch["rank"].to_numpy(zero_copy_only=False) % mod) == 0)
    )
    if keep.num_rows == 0:
        return pa.table({"term": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())})
    parents, _pos, terms, _n = flat_tokens(keep["content"])
    t = pa.table({"term": terms, "parent": pa.array(parents)})
    per_doc = t.group_by(["term", "parent"]).aggregate([])
    agg = per_doc.group_by("term").aggregate([("parent", "count")])
    return pa.table({"term": agg["term"], "n": agg["parent_count"].cast(pa.int64())})
