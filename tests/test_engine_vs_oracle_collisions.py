"""Engine vs oracle on a corpus containing identity collisions.

Large corpora legally contain rows with identical (repo, path, commit)
— the same doc_id — but different content (observed in the synthetic
corpus from ~15k docs: recurring repo-root READMEs).  The engine
resolves these with the content-hash tie-break; the oracle implements
the same spec, and parity must hold.  Collisions are crafted explicitly
here so the test stays small.
"""

import numpy as np
import pyarrow as pa
import pytest

from lighthouse_ray.config import IndexConfig
from lighthouse_ray.corpus import GOLDEN_PHRASE, gen_corpus

from .oracle import Oracle

N_DOCS = 300
CFG = IndexConfig(num_doc_parts=8, num_term_shards=16, salt_range=64, df_sample_mod=10)

COLLIDERS = [
    # same (repo, path, commit) twice with different content
    {"repo": "org0/repo0", "path": "README.md", "commit": "c" * 40, "lang": "md",
     "content": "colliding readme version alpha zebrastripe"},
    {"repo": "org0/repo0", "path": "README.md", "commit": "c" * 40, "lang": "md",
     "content": "colliding readme version beta zebrastripe"},
    # plus an ordinary upsert pair on the same logical key
    {"repo": "org0/repo0", "path": "README.md", "commit": "b" * 40, "lang": "md",
     "content": "older readme zebrastripe"},
]


def _corpus_rows():
    return gen_corpus(N_DOCS).to_pylist() + COLLIDERS


def _corpus_table():
    rows = _corpus_rows()
    return pa.table(
        {k: pa.array([r[k] for r in rows], type=pa.string())
         for k in ("repo", "path", "commit", "lang", "content")}
    )


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    import ray.data as rd

    from lighthouse_ray.build import build_index
    from lighthouse_ray.index import IndexReader
    from lighthouse_ray.query import SearchEngine

    idx = str(tmp_path_factory.mktemp("cidx") / "index")
    build_index(rd.from_arrow(_corpus_table()), idx, CFG)
    return SearchEngine(IndexReader(idx)), Oracle(_corpus_rows())


def test_winner_is_content_tiebreak(pair):
    engine, oracle = pair
    df = engine.search(s="zebrastripe", size=10)
    # exactly one survivor for the colliding key; winner = max commit,
    # then max content hash ("beta..." hashes differ; spec-determined)
    assert len(df) == 1
    want = oracle.search(s="zebrastripe", size=10)
    assert list(df["claimId"]) == [w[0] for w in want]


@pytest.mark.parametrize(
    "case",
    [
        dict(s=GOLDEN_PHRASE, size=10),
        dict(s="readme", size=10),
        dict(s="merge segment", size=10),
        dict(s="@readme", size=10),
        dict(s="import", size=10),
    ],
    ids=lambda c: c["s"][:24],
)
def test_parity_with_collisions(pair, case):
    engine, oracle = pair
    df = engine.search(**case)
    want = oracle.search(**case)
    got = list(zip(df["claimId"], df["score"]))
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-9, atol=1e-6)
