"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``movement_spark`` (see SURVEY.md §7 build plan);
this module just re-exports the paired registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from movement_spark import queries as _Q  # noqa: E402
from movement_spark.operators.windows import tumbling_token_throughput  # noqa: E402
from movement_spark.session import tune_session  # noqa: E402
from movement_spark.sources.tokens import token_sequences  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-source token
    throughput per tumbling window over the derived token-sequence table
    (the north rule's headline aggregate)."""
    tune_session(spark)
    return tumbling_token_throughput(
        token_sequences(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8."""
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per query (omitted only for ops whose
    semantics SQL cannot express; the driver then records rows-only)."""
    return _Q.oracle_sql()
