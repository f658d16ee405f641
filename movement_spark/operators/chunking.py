"""Work distribution: Movement's WorkChunkDriver as explicit repartitioning.

The reference feeds N parallel pipelines from a shared synchronized work
queue (WorkChunkDriver.getNext, SURVEY.md §2.2) — dynamic load balancing by
pull. Spark's task scheduler already does that for free; what we add is the
piece streaming Spark does NOT rebalance automatically: the *key* layout
feeding stateful stages. A few hot doc_ids (power-law shard counts) would
pin whole state-store partitions to one task, so we salt.

``salted_repartition`` splits each key across SALT buckets; downstream
per-doc stages group by (doc_id) again AFTER the heavy per-shard work ran
on the salted layout. For pure aggregations use ``two_phase_agg`` which
does partial-agg on the salted key then final-agg on the real key —
Movement's map-side combine analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def salt_column(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-ROW salt: xxhash64 over every column.

    Salting by the key alone would map a hot key to ONE salt value and
    split nothing; salting randomly would break exactly-once replay.
    Hashing the full row is both spreading and replay-stable.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(buckets)).cast("int")


def salted_repartition(df: DataFrame, key: str, partitions: int,
                       salt_buckets: int = 8,
                       salt_col: str = "_salt") -> DataFrame:
    """WorkChunkDriver analog: spread each key over ``salt_buckets``
    sub-queues, then hash-partition on (key, salt). A hot key now occupies
    up to salt_buckets tasks instead of one."""
    return (
        df.withColumn(salt_col, salt_column(df, salt_buckets))
          .repartition(partitions, F.col(key), F.col(salt_col))
    )


def two_phase_agg(df: DataFrame, key: str, aggs: dict[str, Column],
                  salt_buckets: int = 8) -> DataFrame:
    """Skew-safe aggregation: partial agg on (key, salt), final on key.

    ``aggs`` maps output column -> *re-aggregation* is assumed additive
    (sum/count shapes). For avg, pass sum+count and divide after.
    """
    salted = df.withColumn("_salt", salt_column(df, salt_buckets))
    partial = salted.groupBy(key, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()])
    return partial.groupBy(key).agg(
        *[F.sum(name).alias(name) for name in aggs])


def allocate_output_ids(df: DataFrame, order_cols: list[str],
                        partitions: int = 32,
                        id_col: str = "out_id") -> DataFrame:
    """Gap-free, unique, deterministic 1-based output ids in the total
    order of ``order_cols`` — the OutputIdDriver contract
    (RangedOutputIdDriver.java:57-62) WITHOUT its global atomic counter
    and WITHOUT the naive `row_number() OVER (ORDER BY ...)` plan, which
    funnels every row through ONE task.

    Two-phase (the scalable zipWithIndex): range-partition on the order
    keys, number rows locally within each sorted partition, then add
    each partition's cumulative row-count offset (tiny driver-side
    prefix sum over `partitions` counts, broadcast back).

    The ranged layout MUST be materialized (persist) before the counts
    action: Spark's RangePartitioner samples boundaries with a seed
    derived from the RDD id, so two separate jobs over the same lazy
    plan can place boundary-adjacent rows in DIFFERENT partitions —
    the pid→count map from job 1 then lies about job 2's layout and the
    allocator silently emits duplicate/gapped ids (observed at 2M rows;
    pinned by tests/test_operators.py::test_output_ids_unique_at_2m).
    Persist-to-disk of the ranged layout is also what a production
    allocator does anyway: the numbered run IS the output of phase one,
    written once and reused, exactly like the reference's two-phase
    durable id allocation. The cache is dropped by Spark's LRU (or an
    explicit ``df.unpersist()`` by the caller once the result is
    materialized).
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    ranged = df.repartitionByRange(partitions, *[F.col(c) for c in order_cols])
    w = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
    local = ranged.withColumn("_pid", F.spark_partition_id()) \
                  .withColumn("_rn", F.row_number().over(w)) \
                  .persist(StorageLevel.MEMORY_AND_DISK)
    counts = {r._pid: r.n for r in
              local.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = local.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off BIGINT")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def chunk_stats(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Observability for the work-queue layout: per-bucket row/doc counts —
    the WORK_CHUNKS counter analog (WorkChunkDriver.java:37)."""
    return (
        df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)).cast("int"))
          .groupBy("bucket")
          .agg(F.count("*").alias("n_rows"),
               F.countDistinct(key).alias("n_keys"))
    )


def partition_skew_report(df: DataFrame) -> DataFrame:
    """Rows per physical partition — measures how well the salting spread
    the load. spark_partition_id is the lineage hook (SURVEY.md §2.8)."""
    return (
        df.withColumn("pid", F.spark_partition_id())
          .groupBy("pid").count()
    )
