"""Join operators: keyed shard correlation + relational joins.

The reference's only join-like primitives are positional stream zips
(PinionSystem / SlipWheel / GearBox, SURVEY.md §2.4). Re-expressed
Spark-first, the correlation is KEYED, not positional: shard streams meet
on doc_id with a time-bound condition — a watermarked stream-stream join
in streaming mode, a plain equi-join (with Catalyst picking
broadcast/sort-merge) in batch.

``shard_pair_join`` is the PinionSystem analog: two derived shard streams
(even seq = "wheel A", odd seq = "wheel B") joined per doc within a time
bound; the SlipWheel 1→k multiplicity falls out of the join cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def split_shard_streams(tokens: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Derive the two 'gear wheels': even-seq and odd-seq shard streams."""
    even = tokens.where(F.col("seq") % 2 == 0).select(
        "doc_id", F.col("seq").alias("seq_a"), F.col("n_tok").alias("n_tok_a"),
        F.col("ts").alias("ts_a"))
    odd = tokens.where(F.col("seq") % 2 == 1).select(
        "doc_id", F.col("seq").alias("seq_b"), F.col("n_tok").alias("n_tok_b"),
        F.col("ts").alias("ts_b"))
    return even, odd


def shard_pair_join(tokens: DataFrame, max_gap_sec: int = 60) -> DataFrame:
    """Batch form of the doc_id shard correlation (PinionSystem analog).

    Inner equi-join on doc_id + time-bound |ts_a - ts_b| <= gap; aggregated
    to a per-doc pair count + combined token volume so the result is a
    stable, SQL-checkable scalar set.
    """
    even, odd = split_shard_streams(tokens)
    pairs = even.join(odd, "doc_id").where(
        F.abs(F.col("ts_a").cast("long") - F.col("ts_b").cast("long")) <= max_gap_sec
    )
    return (
        pairs.groupBy("doc_id")
        .agg(F.count("*").alias("n_pairs"),
             F.sum(F.col("n_tok_a") + F.col("n_tok_b")).cast("bigint").alias("pair_tok"))
    )


def streaming_shard_join(tokens_stream: DataFrame,
                         watermark: str = "2 minutes",
                         max_gap_sec: int = 60) -> DataFrame:
    """Watermarked stream-stream join on doc_id (north rule).

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark can evict state: rows older than
    watermark - max_gap are dropped from the join state store.
    """
    even, odd = split_shard_streams(tokens_stream)
    even = even.withWatermark("ts_a", watermark)
    odd = odd.withWatermark("ts_b", watermark)
    cond = (
        (even.doc_id == odd.doc_id)
        & (odd.ts_b >= even.ts_a - F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
        & (odd.ts_b <= even.ts_a + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return even.join(odd, cond, "inner").drop(odd.doc_id)


def top_customers_by_revenue(customer: DataFrame, orders: DataFrame,
                             k: int = 10) -> DataFrame:
    """Relational join + top-k. Catalyst broadcasts the small side under
    AQE; the limit is pushed as TakeOrderedAndProject (no full sort)."""
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
    )
    return (
        customer.join(rev, customer.c_custkey == rev.o_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def region_rollup(customer: DataFrame, nation: DataFrame,
                  region: DataFrame) -> DataFrame:
    """Multi-way dim join + ROLLUP. nation/region are broadcast
    (dimension tables, tiny at any scale)."""
    joined = (
        customer
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"),
             F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )
