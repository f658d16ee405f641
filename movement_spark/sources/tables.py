"""Batch table sources over the driver-provided parquet star schema.

The reference's source abstraction is the Emitter (SURVEY.md §2.1,
core/.../emitter/core/Emitter.java:39): turn partitioned work chunks into a
stream of records. In Spark the same job is done by the DataSource scan —
file listing is the WorkChunkDriver, input splits are the WorkChunks, and
Catalyst pushes filters/projection into the scan (check with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table; scan-level pruning is Catalyst's job."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_duckdb_views(con, sf_dir: str) -> None:
    """Mirror the driver's oracle setup: one DuckDB view per parquet table."""
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
