"""Local mirror of the driver's correctness gate.

Runs each registered query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + order-
insensitive values — the same contract the driver's CORRECTNESS check
applies. Keeping this in-repo means every parity break is caught locally
before a round ends.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

from movement_spark.sources.tables import register_duckdb_views


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = -1
    oracle_rows: int = -1
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)
    spark_sec: float = 0.0  # wall time of the Spark side (budget guard)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: int(v) if isinstance(v, int) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


def compare_frames(name: str, sp: pd.DataFrame, ora: pd.DataFrame) -> ParityResult:
    res = ParityResult(name=name, ok=True,
                       spark_rows=len(sp), oracle_rows=len(ora))
    if sorted(sp.columns) != sorted(ora.columns):
        res.ok = False
        res.detail = f"columns differ: spark={sorted(sp.columns)} oracle={sorted(ora.columns)}"
        return res
    if len(sp) != len(ora):
        res.ok = False
        res.detail = f"row count: spark={len(sp)} oracle={len(ora)}"
        return res
    a, b = _normalize(sp), _normalize(ora)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (
                (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float)
                    and (math.isnan(x) and math.isnan(y) or x == y))
                or x == y
                or (pd.isna(x) and pd.isna(y))
            )
            if not same:
                res.ok = False
                res.mismatches.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                if len(res.mismatches) >= 5:
                    res.detail = "value mismatches (first 5 shown)"
                    return res
    if res.mismatches:
        res.detail = "value mismatches"
        res.ok = False
    return res


def run_parity(spark: SparkSession, sf_dir: str,
               only: list[str] | None = None) -> list[ParityResult]:
    from movement_spark import queries as Q

    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    results: list[ParityResult] = []
    qs, oracles = Q.queries(), Q.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results.append(ParityResult(name, False, detail=f"spark error: {e}"))
            continue
        spark_sec = time.perf_counter() - t0
        if name not in oracles:
            results.append(ParityResult(
                name, len(sp) >= 0, spark_rows=len(sp),
                detail="rows-only (no oracle)", spark_sec=spark_sec))
            continue
        try:
            ora = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results.append(ParityResult(name, False, detail=f"oracle error: {e}"))
            continue
        res = compare_frames(name, sp, ora)
        res.spark_sec = spark_sec
        results.append(res)
    return results
