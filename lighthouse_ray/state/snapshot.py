"""Index snapshot / restore with content verification.

The operational sibling of the reference backend's snapshot API: a
snapshot is a plain directory holding a byte-copy of every index file
plus ``snapshot_manifest.json`` mapping each relative path to its
(size, sha256).  Restore copies the files back and re-hashes each one,
refusing to produce a silently-corrupt index.

Scale posture: hashing and copying fan out as Ray tasks over chunks of
the file list (an index at 10^12 docs is tens of thousands of segment /
payload / docstore files — per-file work is embarrassingly parallel and
IO-bound).  Snapshots are INCREMENTAL by content: a file whose
(size, sha256) already matches the snapshot manifest is skipped, so a
re-snapshot after a delta sync ships only new segments, and an aborted
snapshot resumes where it stopped.  Nothing is driver-held but the
manifest (file-count sized).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

MANIFEST = "snapshot_manifest.json"


class SnapshotError(RuntimeError):
    pass


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f == MANIFEST:
                continue
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def _chunks(xs: list, n: int) -> list[list]:
    if not xs:
        return []
    n = max(1, min(n, len(xs)))
    step = (len(xs) + n - 1) // n
    return [xs[i : i + step] for i in range(0, len(xs), step)]


def _copy_and_hash(src_root: str, dst_root: str, rels: list[str]) -> list[tuple[str, int, str]]:
    """Copy each rel file src->dst and return (rel, size, sha256 of the
    WRITTEN copy) — hashing the destination catches torn writes."""
    out = []
    for rel in rels:
        src = os.path.join(src_root, rel)
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        out.append((rel, os.path.getsize(dst), _sha256(dst)))
    return out


def _hash_files(root: str, rels: list[str]) -> list[tuple[str, int, str]]:
    return [
        (rel, os.path.getsize(os.path.join(root, rel)), _sha256(os.path.join(root, rel)))
        for rel in rels
    ]


def _run_parallel(fn, arg_lists):
    """Fan the chunk calls out as Ray tasks when Ray is up (the normal
    path); plain loop otherwise — results identical."""
    try:
        import ray

        if ray.is_initialized():
            remote = ray.remote(fn)
            return ray.get([remote.remote(*a) for a in arg_lists])
    except ImportError:
        pass
    return [fn(*a) for a in arg_lists]


def snapshot_index(index_dir: str, snap_dir: str, workers: int = 16) -> dict:
    """Snapshot ``index_dir`` into ``snap_dir``; returns stats
    ``{"files": N, "copied": M, "skipped": K, "bytes": B}``.

    Incremental: files whose (size, sha256) already match the existing
    snapshot manifest are not re-copied."""
    files = _walk_files(index_dir)
    prior: dict[str, list] = {}
    mpath = os.path.join(snap_dir, MANIFEST)
    if os.path.exists(mpath):
        prior = json.load(open(mpath))["files"]

    # hash the source in parallel, then copy only what changed
    hashed: list[tuple[str, int, str]] = []
    for part in _run_parallel(_hash_files, [(index_dir, c) for c in _chunks(files, workers)]):
        hashed.extend(part)
    to_copy = [
        rel
        for rel, size, digest in hashed
        if prior.get(rel) != [size, digest]
        and tuple(prior.get(rel, ())) != (size, digest)
    ]
    copied: list[tuple[str, int, str]] = []
    for part in _run_parallel(
        _copy_and_hash, [(index_dir, snap_dir, c) for c in _chunks(to_copy, workers)]
    ):
        copied.extend(part)
    # the copy re-hashes the destination; it must equal the source hash
    src = {rel: (size, d) for rel, size, d in hashed}
    for rel, size, d in copied:
        if src[rel] != (size, d):
            raise SnapshotError(f"torn copy for {rel}: {src[rel]} != {(size, d)}")

    os.makedirs(snap_dir, exist_ok=True)
    manifest = {"files": {rel: [size, d] for rel, size, d in hashed}}
    tmp = mpath + ".tmp"
    json.dump(manifest, open(tmp, "w"))
    os.replace(tmp, mpath)
    return {
        "files": len(files),
        "copied": len(copied),
        "skipped": len(files) - len(copied),
        "bytes": sum(s for _r, s, _d in hashed),
    }


def verify_snapshot(snap_dir: str, workers: int = 16) -> None:
    """Re-hash every snapshot file against the manifest; raises
    :class:`SnapshotError` on any mismatch or missing file."""
    mpath = os.path.join(snap_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise SnapshotError(f"no {MANIFEST} in {snap_dir}")
    want = json.load(open(mpath))["files"]
    missing = [rel for rel in want if not os.path.exists(os.path.join(snap_dir, rel))]
    if missing:
        raise SnapshotError(f"missing files: {missing[:5]}{'...' if len(missing) > 5 else ''}")
    hashed: list[tuple[str, int, str]] = []
    for part in _run_parallel(
        _hash_files, [(snap_dir, c) for c in _chunks(sorted(want), workers)]
    ):
        hashed.extend(part)
    bad = [rel for rel, size, d in hashed if want[rel] != [size, d] and tuple(want[rel]) != (size, d)]
    if bad:
        raise SnapshotError(f"hash mismatch: {bad[:5]}{'...' if len(bad) > 5 else ''}")


def restore_index(snap_dir: str, target_dir: str, workers: int = 16) -> dict:
    """Restore a verified snapshot into ``target_dir`` (which must not
    already contain an index manifest).  Verifies the snapshot FIRST,
    then copies, then re-hashes the restored files — a restore can
    never hand back a corrupt index."""
    verify_snapshot(snap_dir, workers=workers)
    want = json.load(open(os.path.join(snap_dir, MANIFEST)))["files"]
    if os.path.exists(os.path.join(target_dir, "manifest.json")):
        raise SnapshotError(f"{target_dir} already contains an index")
    restored: list[tuple[str, int, str]] = []
    rels = sorted(want)
    for part in _run_parallel(
        _copy_and_hash, [(snap_dir, target_dir, c) for c in _chunks(rels, workers)]
    ):
        restored.extend(part)
    bad = [rel for rel, size, d in restored if want[rel] != [size, d] and tuple(want[rel]) != (size, d)]
    if bad:
        raise SnapshotError(f"restore mismatch: {bad[:5]}")
    return {"files": len(restored), "bytes": sum(s for _r, s, _d in restored)}
