"""Local mirror of the driver's correctness gate (CORRECTNESS_r{N}).

Every registered query runs on Spark AND DuckDB at sf0.001; row counts,
column names, and order-insensitive values must match exactly. Streaming
pipelines are included — their final sink contents are compared to the
same SQL oracles as the batch operators.
"""

import pytest

from movement_spark.testing import run_parity
from movement_spark import queries as Q

BATCH = sorted(n for n in Q.queries() if not n.startswith("streaming_"))
STREAMING = sorted(n for n in Q.queries() if n.startswith("streaming_"))


def test_all_queries_have_oracles():
    missing = set(Q.queries()) - set(Q.oracle_sql())
    assert not missing, f"queries without oracle: {missing}"


def test_driver_order_list_is_consistent():
    """_FRONT (the driver-gate evaluation order) must reference only
    live registry names and contain no duplicates — a stale or
    misspelled entry would silently drop the reordering for everything
    after it."""
    front = Q._FRONT
    assert len(front) == len(set(front)), "duplicate names in _FRONT"
    stale = set(front) - set(Q.queries())
    assert not stale, f"_FRONT names not in registry: {stale}"


def test_batch_parity(spark, sf_dir):
    results = run_parity(spark, sf_dir, only=BATCH)
    assert len(results) == len(BATCH)
    bad = [(r.name, r.detail, r.mismatches[:2]) for r in results if not r.ok]
    assert not bad, f"parity failures: {bad}"


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_parity(spark, sf_dir, name):
    (r,) = run_parity(spark, sf_dir, only=[name])
    assert r.ok, f"{r.detail} {r.mismatches[:3]}"
