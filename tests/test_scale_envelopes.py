"""Operator-level scale-envelope conformance (VERDICT r3 item 8).

SCALE.md claims per-op exchange-volume bounds; this harness checks them
empirically: each heavy dedup/clustering op runs at two input sizes
(documents: 500 rows at sf0.001 vs 5000 at sf0.1, a 10x step) with
exchange accounting on (LIGHTHOUSE_RAY_XCHG_ACCOUNTING), and the
shuffled-row growth factor must stay inside the op's envelope.  A
future regression re-introducing an all-pairs path would read ~100x
(quadratic) and trip the bound.

Envelopes (measured on the synthetic corpus, generous margin):
- linear ops (banded/bucketed by design): ~10x measured, bound 20x —
  minhash LSH candidates, paragraph chunk exchange, ExactSubstr
  occurrence exchange, incremental probe.
- pair-based shingle ops: ~31-37x measured (pair volume grows with
  within-bucket df^2, capped by the max_df hot-shingle guard),
  bound 60x — far below the ~100x an uncapped all-pairs path shows.

Run with: python -m pytest -m scale_envelope -q
"""

import json
import os
import tempfile

import pytest

from lighthouse_ray.pipelines import make_queries

SMALL = "/root/testdata/sf0.001"  # documents: 500 rows
LARGE = "/root/testdata/sf0.1"    # documents: 5000 rows (10x)

# op -> max allowed shuffled-row growth factor for the 10x input step
ENVELOPES = {
    "minhash_lsh": 20.0,
    "paragraph_dedup": 20.0,
    "substring_dup": 20.0,
    "substring_scrub": 20.0,
    "incremental_neardup": 20.0,
    "ngram_jaccard": 60.0,
    "containment_dup": 60.0,
    "winnow_dedup": 60.0,
    "dup_clusters": 60.0,
    "dedup_keep": 60.0,
}


def _exchange_rows(fn, sf_dir: str) -> int:
    acct = tempfile.mktemp(suffix=".jsonl")
    os.environ["LIGHTHOUSE_RAY_XCHG_ACCOUNTING"] = acct
    try:
        out = fn(sf_dir)
        if hasattr(out, "to_pandas"):
            out.to_pandas()  # consume the pipeline
    finally:
        os.environ.pop("LIGHTHOUSE_RAY_XCHG_ACCOUNTING", None)
    if not os.path.exists(acct):
        return 0
    try:
        return sum(json.loads(line)["rows"] for line in open(acct))
    finally:
        os.remove(acct)


@pytest.mark.scale_envelope
@pytest.mark.parametrize("op", sorted(ENVELOPES))
def test_exchange_volume_grows_sub_quadratically(ray_session, op):
    fn = make_queries()[op]
    small = _exchange_rows(fn, SMALL)
    large = _exchange_rows(fn, LARGE)
    assert small > 0, f"{op}: no exchange recorded at {SMALL} — accounting broken?"
    factor = large / small
    bound = ENVELOPES[op]
    assert factor <= bound, (
        f"{op}: exchange volume grew {factor:.1f}x for a 10x input "
        f"(bound {bound}x; quadratic would be ~100x) — "
        f"{small} -> {large} shuffled rows"
    )
