"""Bucketed co-located join: the shuffle-free join strategy for
repeatedly-joined 100 TB fact tables.

SURVEY.md §2.2/§4.2: the reference's WorkChunkDriver pre-partitions work
so each pipeline touches disjoint keys. The batch-warehouse equivalent
is BUCKETING — both sides written bucketBy(k, key) join WITHOUT any
Exchange: each task reads matching bucket files from both tables. The
plan-shape assertion here is the contract: zero shuffles in the join.
"""

import pytest

from pyspark.sql import functions as F

from movement_spark.plans.audit import explain_text
from movement_spark.sources.tables import load_table

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    (load_table(spark, sf_dir, "orders")
     .write.mode("overwrite")
     .bucketBy(N_BUCKETS, "o_custkey").sortBy("o_custkey")
     .saveAsTable("bdb.orders_b"))
    (load_table(spark, sf_dir, "customer")
     .write.mode("overwrite")
     .bucketBy(N_BUCKETS, "c_custkey").sortBy("c_custkey")
     .saveAsTable("bdb.customer_b"))
    yield spark.table("bdb.orders_b"), spark.table("bdb.customer_b")
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, customer_b = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        ).select("o_orderkey", "c_name")
        txt = explain_text(joined, "simple")
        assert "SortMergeJoin" in txt
        assert "Exchange" not in txt, \
            "bucketed join must read co-located buckets, not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    orders_b, customer_b = bucketed
    joined_n = orders_b.join(
        customer_b, orders_b.o_custkey == customer_b.c_custkey).count()
    plain_n = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .count())
    assert joined_n == plain_n
