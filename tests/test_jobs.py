"""Control-plane tests: named jobs + CLI surface.

Mirrors the reference's CLI tests (cli/src/test/java/.../TestCLI.java:
47-146: help/list-tasks/component listing plus a full task run through
the CLI asserting element counts)."""

import pytest

from movement_spark.cli import main, parse_props
from movement_spark.jobs import JOBS, run_job


def test_run_job_export_succeeds(spark, sf_dir, tmp_path):
    res = run_job("Export", spark=spark,
                  **{"input.sf_dir": sf_dir, "output.dir": str(tmp_path / "out")})
    assert res.status == "SUCCEEDED"
    assert res.metrics["rows"] > 0
    assert res.elapsed_sec > 0
    out = spark.read.parquet(res.metrics["output"])
    assert out.count() == res.metrics["rows"]


def test_run_job_unknown_name_raises():
    with pytest.raises(KeyError, match="unknown job"):
        run_job("NoSuchTask")


def test_run_job_failure_reports_status(spark):
    res = run_job("Export", spark=spark,
                  **{"input.sf_dir": "/nonexistent/path"})
    assert res.status.startswith("FAILED")


def test_cli_list_tasks(capsys):
    assert main(["list-tasks"]) == 0
    out = capsys.readouterr().out.split()
    assert set(out) == set(JOBS)


def test_cli_list_queries(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out.split()
    assert "tumbling_token_throughput" in out
    assert len(out) >= 50


def test_props_and_overrides(tmp_path):
    p = tmp_path / "job.properties"
    p.write_text("# comment\ninput.sf_dir = /a/b\nbench.docs=5\n\n")
    conf = parse_props(str(p))
    assert conf == {"input.sf_dir": "/a/b", "bench.docs": "5"}


def test_load_csv_job_roundtrip_with_dead_letters(spark, sf_dir, tmp_path):
    """Reference Load task shape: CSV directory in, keyed store out,
    invalid rows to a dead-letter path (counted, not fatal)."""
    from pyspark.sql import functions as F

    from movement_spark.sinks.directory import write_directory_csv
    from movement_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 50 == 0, None)   # every 50th id NULL
        .otherwise(F.col("c_custkey")).alias("id"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("label"))
    base = str(tmp_path / "csvdir")
    write_directory_csv(src, base, "vertices", "label")
    res = run_job("LoadCsv", spark=spark, **{
        "input.csv_dir": base,
        "output.dir": str(tmp_path / "out")})
    assert res.status == "SUCCEEDED"
    n_total = src.count()
    n_bad = src.where(F.col("id").isNull()).count()
    assert n_bad > 0
    assert res.metrics["dead_letters"] == n_bad
    assert res.metrics["rows"] == n_total - n_bad
