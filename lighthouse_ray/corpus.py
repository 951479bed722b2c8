"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

The BASELINE.json ``input_hint`` mandates a Parquet table
``(repo, path, commit, lang, content)``; no such table exists in the
driver's testdata, so we synthesize it deterministically (seed fixed,
row content a pure function of the row index — independent of
partitioning or parallelism).  Used by unit tests, ``entry()`` and
``bench.py``.

Properties exercised (FIXTURES.md):
- Zipf-ish hot repos; nested paths; langs weighted.
- camelCase + snake_case identifiers (identifier-splitting tokenizer).
- hot tokens (``import``, ``return``, ``def``) in nearly every file
  (hot-term salting path).
- the golden phrase "interesting and amazing facts" planted in >=3 files
  (reference e2e query, app/test/test.go:21).
- ~5%% of (repo, path) keys appear at 2 commits -> last-write-wins upsert
  (reference app/model/claim.go:142-157 upsert by _id).
- log-normal sizes with a few large outliers (wide-record path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CORPUS_VERSION = 2  # bump when generator output changes (invalidates bench caches)

LANGS = ["python", "go", "js", "rust", "java", "md"]
LANG_W = np.array([0.3, 0.15, 0.2, 0.1, 0.15, 0.1])
EXT = {"python": "py", "go": "go", "js": "js", "rust": "rs", "java": "java", "md": "md"}

_BASE_NOUNS = [
    "parser", "index", "token", "shard", "merge", "query", "score", "batch",
    "stream", "buffer", "cache", "config", "handler", "worker", "segment",
    "vector", "matrix", "graph", "node", "edge", "block", "heap", "queue",
    "socket", "channel", "claim", "result", "filter", "cursor", "record",
]
_VERBS = [
    "get", "set", "build", "parse", "merge", "flush", "read", "write", "scan",
    "encode", "decode", "split", "rank", "fetch", "apply", "resolve", "load",
]

# Zipf-ish identifier vocabulary: the base nouns stay ubiquitous (hot
# terms) while thousands of seeded syllable compounds give the corpus a
# realistic long-tail term distribution (df concentrated in few docs).
_SYL = ["ba", "co", "de", "fi", "gu", "ha", "ji", "ka", "lo", "mi",
        "ne", "po", "qu", "ra", "su", "ta", "vo", "wi", "xe", "zo"]


def _gen_vocab(n: int, seed: int = 7) -> list[str]:
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(2, 5)
        out.append("".join(_SYL[i] for i in rng.randint(0, len(_SYL), size=k)))
    return out


_NOUNS = _BASE_NOUNS + _gen_vocab(4000)
_PHRASES = [
    "interesting and amazing facts",
    "fast and reliable pipeline",
    "handle the edge case carefully",
    "this function merges sorted runs",
    "compute the final relevance score",
    "temporary workaround for upstream bug",
    "exact phrase matching support",
    "the quick brown fox jumps",
]

GOLDEN_PHRASE = _PHRASES[0]


def _stable_rng(i: int) -> np.random.RandomState:
    return np.random.RandomState((i * 2654435761 + 42) % (2**32))


_NOUN_CAP = [n.capitalize() for n in _NOUNS]


def _make_content(i: int, rng: np.random.RandomState, lang: str) -> str:
    n_lines = max(4, int(rng.lognormal(2.6, 0.9)))
    if i % 5000 == 1:  # MB-scale outlier
        n_lines = 8000
    lines: list[str] = []
    kw_import, kw_def = ("import", "def") if lang == "python" else ("import", "func")
    # draw everything in bulk (one rng call per stream, not per line)
    ks = rng.randint(0, 5, size=n_lines)
    vs = rng.randint(0, len(_VERBS), size=n_lines)
    # log-uniform noun draws: base nouns stay hot, syllable compounds
    # form the Zipf tail
    n1s = (np.power(float(len(_NOUNS)), rng.rand(n_lines)) - 1).astype(np.int64)
    n2s = (np.power(float(len(_NOUNS)), rng.rand(n_lines)) - 1).astype(np.int64)
    ph = rng.randint(1, len(_PHRASES), size=n_lines)
    cn = rng.randint(0, 100, size=n_lines)
    for _ in range(min(4, n_lines // 3 + 1)):
        lines.append(f"{kw_import} {_NOUNS[n1s[len(lines) % n_lines]]}_{_VERBS[vs[len(lines) % n_lines]]}")
    for j in range(n_lines):
        k = ks[j]
        v, n1, n2 = _VERBS[vs[j]], _NOUNS[n1s[j]], _NOUNS[n2s[j]]
        if k == 0:
            lines.append(f"{kw_def} {v}{_NOUN_CAP[n1s[j]]}{_NOUN_CAP[n2s[j]]}(self, {n2}_id):")
        elif k == 1:
            lines.append(f"    {n1}_{n2} = {v}_{n1}({n2}_count, {cn[j]})")
        elif k == 2:
            lines.append(f"    # {_PHRASES[ph[j]]}")
        elif k == 3:
            lines.append(f'    msg = "{v} {n1} done"')
        else:
            lines.append(f"    return {n1}{_NOUN_CAP[n2s[j]]}.{v}()")
    if i % 97 == 0:
        lines.append(f"# {GOLDEN_PHRASE}")
    return "\n".join(lines)


def gen_rows(n_docs: int) -> dict[str, list]:
    """Generate the corpus row-by-row (pure function of the index)."""
    return gen_rows_range(0, n_docs)


def gen_corpus(n_docs: int) -> pa.Table:
    return pa.table(gen_rows(n_docs))


def gen_rows_range(lo: int, hi: int) -> dict[str, list]:
    """Rows for doc indices [lo, hi) — content is a pure function of the
    index, so any range partition generates identical rows."""
    repos, paths, commits, langs, contents = [], [], [], [], []

    def emit(i: int, version: int) -> None:
        rng = _stable_rng(i * 10 + version)
        repo = f"org{i % 7}/repo{i % 53}"
        if i % 40 == 7:
            lang = "md"
            path = "README.md"
        else:
            lang = LANGS[int(_stable_rng(i).choice(len(LANGS), p=LANG_W))]
            path = f"src/module_{i % 23}/file_{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}@{version}".encode()).hexdigest()
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(_make_content(i, rng, lang))

    for i in range(lo, hi):
        emit(i, 1)
        if i % 20 == 0:
            emit(i, 2)
    return {
        "repo": repos,
        "path": paths,
        "commit": commits,
        "lang": langs,
        "content": contents,
    }


def write_corpus(path: str, n_docs: int) -> str:
    import pyarrow.parquet as pq

    pq.write_table(gen_corpus(n_docs), path)
    return path


def write_corpus_parallel(dir_path: str, n_docs: int, chunk: int = 10_000) -> str:
    """Generate the corpus as a directory of parquet files using Ray tasks
    (deterministic: file k covers indices [k*chunk, (k+1)*chunk))."""
    import os

    import pyarrow.parquet as pq
    import ray

    os.makedirs(dir_path, exist_ok=True)

    @ray.remote
    def gen_part(k: int, lo: int, hi: int) -> str:
        out = os.path.join(dir_path, f"part-{k:05d}.parquet")
        if not os.path.exists(out):
            tbl = pa.table(gen_rows_range(lo, hi))
            pq.write_table(tbl, out + ".tmp")
            os.replace(out + ".tmp", out)
        return out

    futs = [
        gen_part.remote(k, lo, min(lo + chunk, n_docs))
        for k, lo in enumerate(range(0, n_docs, chunk))
    ]
    ray.get(futs)
    return dir_path
