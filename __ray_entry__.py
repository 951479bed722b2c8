"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full inverted-index build over
the sf0.001 documents table + a BM25 top-k query through the segment
reader).  ``queries()`` / ``oracle_sql()`` expose one entry per
implemented operator family from SURVEY.md §2 (see
lighthouse_ray/pipelines/driver_queries.py); Ray column names match the
SQL exactly and floating-point outputs are rounded identically on both
sides.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from lighthouse_ray.pipelines import make_oracle_sql, make_queries


def entry() -> Any:
    """Flagship: index build + BM25 top-k on /root/testdata/sf0.001."""
    from lighthouse_ray.pipelines.driver_queries import q_bm25_topk

    return q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return make_queries()


def oracle_sql() -> dict[str, str]:
    return make_oracle_sql()
