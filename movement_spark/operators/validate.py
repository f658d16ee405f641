"""Row validation + dead-letter routing (ErrorHandler re-expressed).

The reference's error policy is pluggable per component with a fatal
halt default (ErrorHandler.java:20-35, RuntimeUtil.halt:74-76). In a
declarative engine, per-row failures are not exceptions — they are DATA:
every rule is a boolean Column, violations are collected per row, and
the stream splits into a good path and a dead-letter path that carries
WHY each row failed. Fail-fast is then a policy choice on the DLQ count
(halt if > 0), not a control-flow accident — and the split is one
narrow pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

VIOLATIONS_COL = "_violations"


def with_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append an array column naming every failed rule (empty = valid).

    ``rules`` maps rule name -> Column that is TRUE when the row is
    VALID. NULL rule results count as violations (SQL three-valued
    logic must not let bad rows slip through as unknown).
    """
    checks = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.array_compact(F.array(*checks)).cast("array<string>"))


def split_valid(df: DataFrame,
                rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter): good rows drop the marker column; DLQ rows
    keep the violation list for triage/replay."""
    marked = with_violations(df, rules)
    good = marked.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = marked.where(F.size(VIOLATIONS_COL) > 0)
    return good, bad


def violation_stats(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts — the DLQ monitoring surface."""
    marked = with_violations(df, rules)
    return (
        marked.select(F.explode_outer(VIOLATIONS_COL).alias("violation"))
        .groupBy("violation")
        .agg(F.count("*").alias("n_rows"))
    )
