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


def test_async_task_launch_poll_await(spark, sf_dir, tmp_path):
    """Mirrors TestTinkerPopCallStepPlugin.java:209-214: launch a task,
    get an id back immediately, poll TaskStatus while it runs, then
    waitTask and assert the element counts."""
    import uuid as _uuid

    from movement_spark.jobs import (
        list_tasks, run_job_async, task_status, wait_task)

    task_id = run_job_async(
        "Export", spark=spark,
        **{"input.sf_dir": sf_dir, "output.dir": str(tmp_path / "out")})
    _uuid.UUID(task_id)  # the handle is a real UUID, like the reference's
    st = task_status(task_id)  # status is pollable WHILE running
    assert st["status"] in ("RUNNING", "SUCCEEDED")
    assert st["name"] == "Export"
    res = wait_task(task_id, timeout=300)
    assert res.status == "SUCCEEDED"
    assert res.metrics["rows"] > 0
    done = task_status(task_id)
    assert done["status"] == "SUCCEEDED"
    assert done["metrics"]["rows"] == res.metrics["rows"]
    assert any(t["task_id"] == task_id for t in list_tasks())


def test_async_task_failure_is_observable(spark):
    from movement_spark.jobs import run_job_async, wait_task

    task_id = run_job_async("Export", spark=spark,
                            **{"input.sf_dir": "/nonexistent/path"})
    res = wait_task(task_id, timeout=300)
    assert res.status.startswith("FAILED")


def test_unknown_task_id_raises():
    import pytest as _pytest

    from movement_spark.jobs import task_status, wait_task
    with _pytest.raises(KeyError):
        task_status("nope")
    with _pytest.raises(KeyError):
        wait_task("nope")


def test_cli_task_prints_live_status(spark, sf_dir, tmp_path, capsys):
    """CLI.java:29-34: a 1 Hz StatusMonitor line during the run — the
    CLI must emit at least one live status line for a non-trivial task
    and still print the final JSON result."""
    import json as _json

    rc = main(["task", "Migrate",
               "-s", f"input.sf_dir={sf_dir}",
               "-s", f"output.dir={tmp_path / 'mig'}"])
    captured = capsys.readouterr()
    assert rc == 0
    out = _json.loads(captured.out.strip().splitlines()[-1])
    assert out["status"] == "SUCCEEDED"
    assert "issued" in captured.err and "io operations" in captured.err


def test_async_task_resolves_when_thread_crashes(monkeypatch):
    """An exception escaping run_job itself (e.g. session construction
    failing before its try block) must still resolve the task to FAILED —
    never leave task_status reporting RUNNING for a dead thread (r02
    review finding)."""
    import movement_spark.jobs as J

    def boom(name, spark=None, **conf):
        raise RuntimeError("session construction failed")

    monkeypatch.setattr(J, "run_job", boom)
    task_id = J.run_job_async("Export")
    res = J.wait_task(task_id, timeout=30)
    assert res.status.startswith("FAILED")
    assert "session construction failed" in res.status
    assert J.task_status(task_id)["status"].startswith("FAILED")


def test_repair_job_patches_damaged_window(spark, sf_dir):
    """Repair task: recomputes named tumbling windows from the source
    table and upserts them as a trailing epoch — after deliberately
    corrupting one window with a newer all-zeros epoch, the repair must
    restore the sink read to exactly its pre-damage contents (and prove
    the damage was visible in between, so the repair is load-bearing)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from movement_spark.jobs import run_job
    from movement_spark.sinks.idempotent import IdempotentKeyedSink
    from movement_spark.sources.tokens import EPOCH_2026

    out = tempfile.mkdtemp(prefix="ms_repair_job_")
    mig = run_job("Migrate", spark=spark, **{
        "input.sf_dir": sf_dir, "output.dir": out})
    assert mig.status == "SUCCEEDED"
    sink = IdempotentKeyedSink(os.path.join(out, "sink"), ["ws", "source"])
    truth = sink.read(spark).persist()
    truth.count()  # materialize BEFORE damaging (truth is lazy)
    ws0 = EPOCH_2026
    bad = (truth.where(F.col("ws") == ws0)
           .withColumn("n_seq", F.lit(0).cast("bigint"))
           .withColumn("sum_tok", F.lit(0).cast("bigint")))
    sink.foreach_batch(bad, max(sink.epochs()) + 1)
    damaged = sink.read(spark).where(F.col("ws") == ws0) \
        .agg(F.sum("n_seq")).collect()[0][0]
    assert damaged == 0, "corruption must be visible pre-repair"
    res = run_job("Repair", spark=spark, **{
        "sink.dir": os.path.join(out, "sink"), "sf.dir": sf_dir,
        "repair.windows": str(ws0)})
    assert res.status == "SUCCEEDED", res.status
    assert res.metrics["windows_repaired"] == 1
    after = sink.read(spark)
    assert after.exceptAll(truth).count() == 0
    assert truth.exceptAll(after).count() == 0
    truth.unpersist()


def test_repair_job_visible_after_compact(spark, sf_dir):
    """A repair against a COMPACTED sink must still be read-visible:
    epochs() is empty after compaction (everything folded into the
    snapshot), so a naive max(epochs())+1 fallback would write epoch 0
    — at/below the watermark, invisible to read() and reclaimed
    unfolded by the next compact(). next_patch_epoch() must clear the
    watermark instead."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from movement_spark.jobs import run_job
    from movement_spark.sinks.idempotent import IdempotentKeyedSink
    from movement_spark.sources.tokens import EPOCH_2026

    out = tempfile.mkdtemp(prefix="ms_repair_compacted_")
    mig = run_job("Migrate", spark=spark, **{
        "input.sf_dir": sf_dir, "output.dir": out})
    assert mig.status == "SUCCEEDED"
    sink = IdempotentKeyedSink(os.path.join(out, "sink"), ["ws", "source"])
    truth = sink.read(spark).persist()
    truth.count()
    cmp_res = run_job("Compact", spark=spark, **{
        "sink.dir": f"{out}/sink", "sink.keys": "ws,source"})
    assert cmp_res.status == "SUCCEEDED"
    assert sink.epochs() == [], "compaction must fold the epoch log"
    res = run_job("Repair", spark=spark, **{
        "sink.dir": os.path.join(out, "sink"), "input.sf_dir": sf_dir,
        "repair.windows": str(EPOCH_2026)})
    assert res.status == "SUCCEEDED", res.status
    wm = sink.compaction_watermark()
    assert res.metrics["epoch"] > wm, \
        f"patch epoch {res.metrics['epoch']} must clear watermark {wm}"
    after = sink.read(spark)
    assert after.exceptAll(truth).count() == 0
    assert truth.exceptAll(after).count() == 0
    truth.unpersist()


def test_compact_job_preserves_visible_rows(spark, sf_dir):
    """Compact task: collapses the epoch log into the snapshot with
    identical read-visible results and reports the reclaimed epochs."""
    import tempfile

    from movement_spark.jobs import run_job

    out = tempfile.mkdtemp(prefix="ms_compact_job_")
    mig = run_job("Migrate", spark=spark, **{
        "input.sf_dir": sf_dir, "output.dir": out})
    assert mig.status == "SUCCEEDED"
    res = run_job("Compact", spark=spark, **{
        "sink.dir": f"{out}/sink", "sink.keys": "ws,source"})
    assert res.status == "SUCCEEDED", res.status
    assert res.metrics["rows"] == mig.metrics["rows"]
    assert res.metrics["epochs_collapsed"] >= 1
    assert res.metrics["watermark"] is not None


def test_conf_dict_channel_tolerates_reserved_key_names(spark, sf_dir):
    """User-controlled config keys named after run_job's own parameters
    ('name', 'spark' — e.g. a properties file carrying name=myrun) must
    run the job, not TypeError: the conf-dict channel (what the CLI
    uses) routes them around the positional parameters."""
    import tempfile

    from movement_spark.jobs import run_job

    res = run_job("Export", spark=spark, conf={
        "input.sf_dir": sf_dir,
        "output.dir": tempfile.mkdtemp(prefix="ms_confkey_"),
        "name": "user-supplied-run-name",
        "spark": "user-supplied-junk"})
    assert res.status == "SUCCEEDED", res.status


def test_finished_async_tasks_are_pruned_at_cap(spark, sf_dir, monkeypatch):
    """The async task registry must not grow without bound: finished
    handles beyond _TASKS_KEEP are evicted oldest-first at launch (the
    reference's runtime drops completed futures)."""
    import movement_spark.jobs as J

    monkeypatch.setattr(J, "_TASKS_KEEP", 3)
    with J._TASKS_LOCK:
        saved = dict(J._TASKS)
        J._TASKS.clear()
    try:
        ids = []
        for _ in range(5):
            tid = J.run_job_async("Export", spark=spark, conf={
                "input.sf_dir": "/nonexistent/prune_probe"})
            J.wait_task(tid)
            ids.append(tid)
        with J._TASKS_LOCK:
            kept = set(J._TASKS)
        assert len(kept) <= 3
        assert ids[-1] in kept, "the newest task must survive pruning"
    finally:
        with J._TASKS_LOCK:
            J._TASKS.clear()
            J._TASKS.update(saved)


def test_build_corpus_job_end_to_end(spark, sf_dir, tmp_path):
    """BuildCorpus materializes the composed pipeline: the written
    corpus honors every stage's contract (no duplicate text, en-only,
    ≤cap docs per (source, lang), split ∈ {train,val,test}), the
    manifest conserves rows_in across keep + funnel drops + cap drops,
    and a second run over the same input writes byte-identical doc_id
    sets (the determinism the audit trail depends on)."""
    from pyspark.sql import functions as F

    from movement_spark.jobs import run_job

    res = run_job("BuildCorpus", spark=spark, conf={
        "input.sf_dir": sf_dir, "output.dir": str(tmp_path / "one")})
    assert res.status == "SUCCEEDED", res.status
    m = res.metrics
    import os
    corpus = spark.read.parquet(os.path.join(m["output"], "corpus"))
    # stage contracts on the materialized rows
    assert corpus.count() == m["rows_kept"] > 0
    assert corpus.groupBy("text").count().agg(
        F.max("count")).collect()[0][0] == 1, "exact dup survived"
    assert corpus.where(F.col("lang") != "en").count() == 0
    over = (corpus.groupBy("source", "lang").count()
            .where(F.col("count") > m["cap"]).count())
    assert over == 0, "source cap violated"
    splits = {r["split"] for r in corpus.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # manifest conservation: in == kept + funnel drops + cap drops
    drops = sum(v for k, v in m.items() if k.startswith("dropped_"))
    assert m["rows_in"] == m["rows_kept"] + drops, m
    assert sum(v for k, v in m.items()
               if k.startswith("split_")) == m["rows_kept"]
    # determinism: a re-run to a fresh dir keeps the identical doc set
    res2 = run_job("BuildCorpus", spark=spark, conf={
        "input.sf_dir": sf_dir, "output.dir": str(tmp_path / "two")})
    ids = lambda r: sorted(  # noqa: E731
        x["doc_id"] for x in spark.read.parquet(
            os.path.join(r.metrics["output"], "corpus"))
        .select("doc_id").collect())
    assert ids(res) == ids(res2)
