"""Deduplication operators for large-scale training-data pipelines.

All of these follow the same Ray-Data shape: vectorized per-batch
signature computation in ``map_batches`` (numpy ``reduceat`` over the
flat token stream — no Python loop over docs), then a ``groupby`` on
the bucket key to surface candidates, then verification.  Exact dedup
by content hash lives in pipelines/driver_queries.py (oracle-checked).

- :func:`minhash_signatures` / :func:`minhash_lsh_candidates` —
  shingle → minhash → banded LSH → candidate pairs with estimated
  Jaccard (signature agreement).
- :func:`simhash_signatures` / :func:`simhash_candidates` — 64-bit
  simhash, hamming<=k candidates via the pigeonhole band trick.
- :func:`ngram_jaccard_pairs` — exact token-shingle Jaccard via a
  shingle-inverted-index shuffle (SQL-expressible; oracle-checked in
  pipelines/driver_queries.py).
- :func:`embedding_cosine_pairs` — near-duplicate pairs by embedding
  cosine against a broadcast normalized matrix.

Partitioning assumptions are documented per function; every bucket key
is a content hash, so results are independent of block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis import flat_tokens

# fixed seeded 64-bit affine hashers for minhash (a*x+b mod p)
_P = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(batch: pa.Table, text_col: str, k: int):
    """k-token shingle hashes per doc: (flat uint64 hashes, doc offsets)."""
    parents, _pos, terms, n = flat_tokens(batch[text_col])
    tcodes = terms.dictionary_encode()
    codes = tcodes.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    # stable per-term hash: fnv over the term string, vectorized via dict
    uniq = tcodes.dictionary.to_pylist()
    import hashlib

    uh = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big") for t in uniq],
        dtype=np.uint64,
    )
    th = uh[codes.astype(np.int64)]
    counts = np.bincount(parents, minlength=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    # rolling k-window combine: h = sum_i rot(th[j+i], i)  (order-sensitive)
    if len(th) == 0:
        return np.zeros(0, dtype=np.uint64), offs, np.zeros(n, dtype=np.int64)
    sh_parts = []
    sh_offs = np.zeros(n + 1, dtype=np.int64)
    for d in range(n):
        s, e = offs[d], offs[d + 1]
        toks = th[s:e]
        if e - s < k:
            sh = toks[:0] if e == s else np.array([np.bitwise_xor.reduce(toks)], dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(toks, k)
            rot = np.arange(k, dtype=np.uint64)
            sh = np.zeros(len(w), dtype=np.uint64)
            for i in range(k):
                c = w[:, i]
                sh ^= (c << rot[i]) | (c >> np.uint64(64 - int(rot[i]) if rot[i] else 64))
        sh_parts.append(sh)
        sh_offs[d + 1] = sh_offs[d] + len(sh)
    flat = np.concatenate(sh_parts) if sh_parts else np.zeros(0, dtype=np.uint64)
    return flat, sh_offs, counts


def minhash_signatures(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, k: int = 5) -> pa.Table:
    """Per-doc minhash signature (num_perm x uint64) — vectorized: one
    affine transform + ``minimum.reduceat`` over the flat shingle stream
    per permutation."""
    flat, offs, _counts = _shingle_hashes(batch, text_col, k)
    n = batch.num_rows
    a, b = _perm_params(num_perm)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat):
        nonempty = np.flatnonzero(np.diff(offs) > 0)
        starts = offs[nonempty]
        for p in range(num_perm):
            hv = (a[p] * flat + b[p]) % _P
            sigs[nonempty, p] = np.minimum.reduceat(hv, starts)
    return pa.table(
        {
            id_col: batch[id_col],
            "sig": pa.array(list(sigs), type=pa.list_(pa.uint64(), num_perm)),
        }
    )


def minhash_lsh_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, bands: int = 16, k: int = 5,
                           threshold: float = 0.5):
    """MinHash + banded LSH near-dup candidates.

    shingle → minhash (map_batches) → explode (band, band_hash, id, sig)
    → groupby(band, band_hash) → pairs within buckets → groupby(pair) →
    estimated Jaccard = signature agreement; keep >= threshold.
    Partitioning: bucket key is a content hash — layout independent.
    """
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        sigt = minhash_signatures(batch, text_col, id_col, num_perm, k)
        sigs = np.asarray(sigt["sig"].combine_chunks().flatten()).reshape(-1, num_perm)
        ids = sigt[id_col].to_pylist()
        out_band, out_hash, out_id, out_sig = [], [], [], []
        import hashlib

        for i, d in enumerate(ids):
            for bnd in range(bands):
                seg = sigs[i, bnd * rows_per_band : (bnd + 1) * rows_per_band]
                h = int.from_bytes(hashlib.blake2b(seg.tobytes(), digest_size=8).digest(), "big")
                out_band.append(bnd)
                out_hash.append(h)
                out_id.append(d)
                out_sig.append(sigs[i].tobytes())
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bhash": pa.array(out_hash, type=pa.uint64()),
                "id": pa.array(out_id),
                "sig": pa.array(out_sig, type=pa.large_binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = g.sort_values("id")
        ids = g["id"].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(round(est, 6))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    cands = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "bhash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can surface from several bands -> dedup by (a, b)
    return (
        cands.groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def simhash_signatures(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit simhash over the token stream (bitwise weighted majority),
    vectorized: 64 ``add.reduceat`` passes over the flat hash stream."""
    parents, _pos, terms, n = flat_tokens(batch[text_col])
    import hashlib

    tcodes = terms.dictionary_encode()
    codes = tcodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = tcodes.dictionary.to_pylist()
    uh = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big") for t in uniq],
        dtype=np.uint64,
    )
    th = uh[codes] if len(codes) else np.zeros(0, dtype=np.uint64)
    counts = np.bincount(parents, minlength=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    sims = np.zeros(n, dtype=np.uint64)
    if len(th):
        nonempty = np.flatnonzero(counts > 0)
        starts = offs[nonempty]
        for bit in range(64):
            pm = (((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1)
            tot = np.add.reduceat(pm, starts)
            sims[nonempty] |= (tot > 0).astype(np.uint64) << np.uint64(bit)
    return pa.table({id_col: batch[id_col], "simhash": pa.array(sims)})


def simhash_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, bands: int = 4):
    """Near-dup candidates with hamming distance <= max_hamming via the
    pigeonhole trick: split the 64-bit simhash into ``bands`` segments;
    any pair within the distance agrees exactly on >=1 segment."""
    seg_bits = 64 // bands
    mask = np.uint64((1 << seg_bits) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch, text_col, id_col)
        s = sig["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = sig[id_col].to_pylist()
        bnds, keys, out_id, out_sim = [], [], [], []
        for bnd in range(bands):
            seg = (s >> np.uint64(bnd * seg_bits)) & mask
            bnds.extend([bnd] * len(ids))
            keys.extend(int(x) for x in seg)
            out_id.extend(ids)
            out_sim.extend(int(x) for x in s)
        return pa.table(
            {
                "band": pa.array(bnds, type=pa.int32()),
                "key": pa.array(keys, type=pa.uint64()),
                "id": pa.array(out_id),
                "simhash": pa.array(out_sim, type=pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        g = g.sort_values("id")
        ids = g["id"].tolist()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = int(bin(int(sims[i]) ^ int(sims[j])).count("1"))
                if h <= max_hamming and ids[i] != ids[j]:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(h)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def ngram_jaccard_pairs(ds, n: int = 3, min_inter: int = 5,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Exact token n-gram Jaccard via a shingle inverted index:
    doc → distinct shingles → groupby(shingle) → pairs → groupby(pair)
    count intersections → Jaccard with per-doc shingle counts broadcast
    implicitly through the pair rows.  SQL-expressible; oracle-checked.
    """
    from ray.data.aggregate import Sum

    def shingles(batch: pa.Table) -> pa.Table:
        parents, _pos, terms, nrows = flat_tokens(batch[text_col])
        terms_py = terms.to_pylist()
        counts = np.bincount(parents, minlength=nrows)
        offs = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        ids = batch[id_col].to_pylist()
        out_id, out_sh, out_cnt_id, out_cnt = [], [], [], []
        for d in range(nrows):
            toks = terms_py[offs[d] : offs[d + 1]]
            sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            out_id.extend([ids[d]] * len(sh))
            out_sh.extend(sorted(sh))
            out_cnt_id.append(ids[d])
            out_cnt.append(len(sh))
        t1 = pa.table({"id": pa.array(out_id), "sh": pa.array(out_sh, type=pa.string()),
                       "nsh": pa.array([0] * len(out_id), type=pa.int64())})
        t2 = pa.table({"id": pa.array(out_cnt_id), "sh": pa.array([""] * len(out_cnt), type=pa.string()),
                       "nsh": pa.array(out_cnt, type=pa.int64())})
        return pa.concat_tables([t1, t2])

    exploded = ds.map_batches(shingles, batch_format="pyarrow")

    def shingle_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g["sh"].iloc[0] == "" or len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "inter": []})
        ids = sorted(g["id"].tolist())
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b, "inter": [1] * len(out_a)})

    import pyarrow.compute as pc

    pairs = (
        exploded.map_batches(
            lambda b: b.filter(pc.not_equal(b["sh"], "")), batch_format="pyarrow"
        )
        .groupby("sh")
        .map_groups(shingle_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("inter", alias_name="inter"))
    )
    sizes_pd = (
        exploded.map_batches(
            lambda b: b.filter(pc.equal(b["sh"], "")), batch_format="pyarrow"
        )
        .select_columns(["id", "nsh"])
        .to_pandas()
    )
    import ray as _ray_bc

    # broadcast once via plasma; a closure-captured dict would be
    # re-pickled into every task
    size_ref = _ray_bc.put(dict(zip(sizes_pd["id"], sizes_pd["nsh"])))

    def finish(b: pa.Table) -> pa.Table:
        import ray as _ray

        size_map = _ray.get(size_ref)
        a = b["a"].to_pylist()
        bb = b["b"].to_pylist()
        inter = b["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = np.array([size_map[x] for x in a], dtype=np.int64)
        nb = np.array([size_map[x] for x in bb], dtype=np.int64)
        jac = inter / (na + nb - inter)
        keep = inter >= min_inter
        return pa.table(
            {
                "a": pa.array(np.asarray(a, dtype=object)[keep].tolist()),
                "b": pa.array(np.asarray(bb, dtype=object)[keep].tolist()),
                "inter": pa.array(inter[keep]),
                "jaccard": pa.array(np.round(jac[keep], 6)),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def embedding_cosine_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id",
                           vec_col: str = "embedding", matrix_ref=None):
    """Embedding near-dup pairs: per-batch cosine against the broadcast
    normalized matrix (numpy matmul); emits (a, b, cos) with a < b.
    Scale path: LSH/IVF bucket the rows first (similarity.py)."""
    import ray

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(matrix_ref)
        emb = batch[vec_col].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        m = flat.reshape(batch.num_rows, -1)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ m_all.T
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        out_a, out_b, out_c = [], [], []
        hit_r, hit_c = np.nonzero(cos >= threshold)
        for r, c in zip(hit_r, hit_c):
            a, b = int(ids[r]), int(ids_all[c])
            if a < b:
                out_a.append(a)
                out_b.append(b)
                out_c.append(round(float(cos[r, c]), 6))
        return pa.table(
            {
                "a": pa.array(out_a, type=pa.int64()),
                "b": pa.array(out_b, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Duplicate clusters: distributed connected components over candidate pairs
# ---------------------------------------------------------------------------

def _star_round(edges, large: bool):
    """One alternating-star round (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14) as pure Ray Data passes."""
    import pyarrow.compute as pc

    def undirect(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays([b["a"].combine_chunks(), b["b"].combine_chunks()]),
                "v": pa.concat_arrays([b["b"].combine_chunks(), b["a"].combine_chunks()]),
            }
        )

    def orient_to_max(b: pa.Table) -> pa.Table:
        # small-star processes each edge at its larger endpoint
        hi = pc.max_element_wise(b["a"], b["b"])
        lo = pc.min_element_wise(b["a"], b["b"])
        return pa.table({"u": hi, "v": lo})

    def star_group(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].iloc[0]
        nbrs = np.unique(g["v"].to_numpy())
        m = min(u, nbrs[0] if len(nbrs) else u)
        if large:
            out_v = nbrs[nbrs > u]          # attach strictly-larger nbrs to m
        else:
            out_v = np.unique(np.append(nbrs[nbrs <= u], u))
            out_v = out_v[out_v != m]       # attach u and small nbrs to m
        if len(out_v) == 0:
            out_v = np.array([u]) if not large else np.array([], dtype=object)
        return pd.DataFrame({"a": out_v, "b": np.full(len(out_v), m)})

    prep = undirect if large else orient_to_max
    return (
        edges.map_batches(prep, batch_format="pyarrow")
        .groupby("u")
        .map_groups(star_group, batch_format="pandas")
    )


def connected_components(edges, nodes, max_rounds: int = 32):
    """Connected components over an edge Dataset with string/int columns
    (a, b); returns Dataset[(id, cluster)] where cluster is the minimum
    node id of the component.  Alternating large-star / small-star
    rounds (each a groupby exchange keyed by node — content-addressed,
    layout-independent) until the edge multiset is stable, then a final
    min-label pass; isolated nodes label themselves.

    ``nodes`` is a Dataset with column ``id`` covering every node
    (edges may touch a subset)."""
    import pyarrow.compute as pc

    def digest(ds) -> tuple:
        def part(b: pa.Table) -> pa.Table:
            import hashlib as _h

            acc = 0
            for a_, b_ in zip(b["a"].to_pylist(), b["b"].to_pylist()):
                acc ^= int.from_bytes(
                    _h.blake2b(f"{a_}\0{b_}".encode(), digest_size=8).digest(), "big"
                )
            return pa.table(
                {"n": pa.array([b.num_rows]), "x": pa.array([acc], type=pa.uint64())}
            )

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        return (sum(r["n"] for r in rows), _xor([r["x"] for r in rows]))

    def _xor(vals):
        acc = 0
        for v in vals:
            acc ^= int(v)
        return acc

    cur = edges
    prev_sig = None
    for _ in range(max_rounds):
        cur = _star_round(cur, large=True).materialize()
        cur = _star_round(cur, large=False).materialize()
        sig = digest(cur)
        if sig == prev_sig:
            break
        prev_sig = sig

    # final labels: min(b) per a over the star edges, then left-join the
    # node universe (broadcast of the label table would not scale; the
    # label assignment is itself a groupby exchange)
    def min_label(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.array([g["id"][0].as_py()]),
                "cluster": pa.array([pc.min(g["cluster"]).as_py()]),
            }
        )

    labels = (
        cur.map_batches(
            lambda b: pa.table({"id": b["a"], "cluster": b["b"]}), batch_format="pyarrow"
        )
        .groupby("id")
        .map_groups(min_label, batch_format="pyarrow")
    )
    lab = labels.union(
        nodes.map_batches(
            lambda b: pa.table({"id": b["id"], "cluster": b["id"]}),
            batch_format="pyarrow",
        )
    )
    # per-id min resolves (star label) vs (self label) — isolated nodes
    # keep themselves
    return lab.groupby("id").map_groups(min_label, batch_format="pyarrow")
