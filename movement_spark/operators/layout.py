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


# =====================================================================
# Bucketed (co-located) joins — the pre-shuffled layout
# =====================================================================

N_BUCKETS = 8  # matches the pinned stateful-shuffle deployment constant


def stage_bucketed_pair(spark, orders: DataFrame, lineitem: DataFrame,
                        base: str, tag: str) -> dict[str, str]:
    """Write orders + lineitem as co-bucketed data-source tables.

    ``bucketBy(N, key)`` is Spark's persisted hash-partitioning: both
    tables land pre-shuffled on the join key, so every later join or
    aggregate on that key reads bucket-aligned files with ZERO Exchange
    — at 100 TB this converts the biggest fact-fact shuffle in the
    system into a metadata no-op, paid once at write time. The
    ``repartition(N, key)`` before the write uses the same hash family
    as the bucket spec, so each task holds exactly one bucket's rows
    and emits one file per bucket (``sortBy`` then keeps each bucket
    file sorted, eliminating the join's per-side sort as well when
    files stay 1:1). Returns {short_name: catalog_table_name}.
    """
    import os

    names: dict[str, str] = {}
    specs = (("orders", orders, "o_orderkey"),
             ("lineitem", lineitem, "l_orderkey"))
    for short, df, key in specs:
        name = f"ms_bkt_{short}_{tag}"
        (df.repartition(N_BUCKETS, F.col(key))
         .write.mode("overwrite")
         .option("path", os.path.join(base, short))
         .bucketBy(N_BUCKETS, key).sortBy(key)
         .saveAsTable(name))
        names[short] = name
    return names


def colocated_order_lines(spark, orders_tbl: str,
                          lineitem_tbl: str) -> DataFrame:
    """Per-order line stats over the co-bucketed pair.

    The whole stage — scan, sort-merge join, per-order aggregate — runs
    inside the bucket layout: the scans report HashPartitioning on the
    bucket key, the join consumes it on both sides, and the groupBy on
    (o_orderkey, ...) is satisfied by the same clustering, so the plan
    contains no Exchange at all (pinned by
    tests/test_plans.py::test_bucketed_join_is_shuffle_free).
    """
    o = spark.table(orders_tbl).select("o_orderkey", "o_orderstatus")
    li = spark.table(lineitem_tbl).select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("*").alias("n_lines"),
             F.sum(rev).alias("rev"))
    )
