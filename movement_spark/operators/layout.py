"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the scan is the query: a layout that co-locates rows close in
TWO dimensions lets file-level min/max statistics prune on either
predicate. Z-ordering interleaves the bits of both keys so one sort
key preserves locality in both — the standard multi-dim layout trick
(Delta/Iceberg OPTIMIZE ZORDER) expressed as plain integer arithmetic
any engine reproduces exactly.

``zorder_layout_stats`` reports, per z-bucket, the min/max span of each
dimension — the exact statistics a file skipper would consult. Tight
spans in BOTH columns are the win; a single-column sort gives tight
spans in one and full-range spans in the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

Z_BITS = 12       # bits interleaved per dimension
Z_MOD = 1 << Z_BITS  # dims are taken mod 2^Z_BITS: z-ordering only
                     # clusters on bits that VARY; constant high bits
                     # (epoch-day offsets) would waste interleave slots
Z_BUCKET_SHIFT = 18  # 2*Z_BITS - 6 → 64 z-buckets


def _interleave_terms(a: str, b: str, shift_fn) -> str:
    """Bit-interleave expression: a's bit i lands at 2i, b's at 2i+1.
    ``shift_fn(col, i)`` renders a right-shift — engines differ in
    syntax (Spark ``shiftright``, DuckDB ``>>``) but not semantics."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({shift_fn(a, i)} & 1) * {1 << (2 * i)})")
        terms.append(f"(({shift_fn(b, i)} & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def spark_zvalue(a: str, b: str) -> str:
    return _interleave_terms(
        a, b, lambda c, i: f"shiftright(cast({c} as bigint), {i})")


def duckdb_zvalue(a: str, b: str) -> str:
    return _interleave_terms(a, b, lambda c, i: f"(CAST({c} AS BIGINT) >> {i})")


def zorder_layout_stats(orders: DataFrame) -> DataFrame:
    """Per-z-bucket clustering statistics for (o_custkey, order day).

    One projection computes the z-value (pure bit arithmetic, whole-
    stage codegen), one map-side-combined aggregate per bucket. In a
    real table rewrite the z-value would be the repartitionByRange /
    sortWithinPartitions key of the OPTIMIZE job; the stats emitted
    here are precisely the file-footer min/max a reader would prune on.
    """
    day = "datediff(to_date(o_orderdate), date'1970-01-01')"
    z = spark_zvalue(f"(o_custkey % {Z_MOD})", f"({day} % {Z_MOD})")
    return (
        orders
        .withColumn("z", F.expr(z))
        .withColumn("bucket",
                    F.expr(f"z div {1 << Z_BUCKET_SHIFT}").cast("int"))
        .withColumn("day_no", F.expr(day).cast("int"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"),
             F.min("o_custkey").cast("bigint").alias("min_cust"),
             F.max("o_custkey").cast("bigint").alias("max_cust"),
             F.min("day_no").alias("min_day"),
             F.max("day_no").alias("max_day"))
        .withColumn("cust_span",
                    (F.col("max_cust") - F.col("min_cust")).cast("bigint"))
        .withColumn("day_span",
                    (F.col("max_day") - F.col("min_day")).cast("int"))
    )
