"""OutputLogger analog: log messages through the data sink machinery.

Mirrors OutputLogger.java:33-37 (writeToOutput: encode the LogMessage,
hand it to the Output writer keyed by message label) and the CSV field
layout of CSVLogMessageEncoder.java:48-52."""

from pyspark.sql import functions as F

from movement_spark.sinks.logger import DirectoryOutputLogger


def test_log_messages_roundtrip_through_directory_sink(spark, tmp_path):
    clock = iter(range(100)).__next__  # deterministic timestamps
    log = DirectoryOutputLogger(spark, str(tmp_path), name="engine",
                                clock=lambda: float(clock()))
    log.info("phase one started", phase="ONE")
    log.warn("slow chunk", chunk=7)
    log.error("dangling edge dropped", doc="d42")
    log.flush()
    log.info("phase two started", phase="TWO")
    log.close()  # close flushes the tail — two flush dirs total

    back = log.read(spark)
    assert back.count() == 4
    by_level = {r.level: r.n for r in
                back.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert by_level == {"INFO": 2, "WARN": 1, "ERROR": 1}
    rows = {r.seq: r for r in back.collect()}
    assert rows[0].message == "phase one started"
    assert '"phase": "ONE"' in rows[0].context
    assert rows[2].level == "ERROR" and rows[2].logger == "engine"
    # total order is the seq column, independent of flush boundaries
    assert sorted(rows) == [0, 1, 2, 3]
    assert log.metrics() == {"io_ops": 4, "buffered": 0}


def test_logger_per_level_directory_layout(spark, tmp_path):
    import os

    log = DirectoryOutputLogger(spark, str(tmp_path), clock=lambda: 0.0)
    log.info("a")
    log.error("b")
    log.flush()
    flush0 = os.path.join(tmp_path, "logs", "flush=0")
    labels = sorted(d for d in os.listdir(flush0) if d.startswith("level="))
    assert labels == ["level=ERROR", "level=INFO"]


def test_second_logger_instance_appends_not_clobbers(spark, tmp_path):
    """A fresh logger over an existing base_dir (new process / second
    job) must APPEND to the log storage — flush numbering resumes from
    disk instead of overwriting flush=0 (r02 review finding)."""
    a = DirectoryOutputLogger(spark, str(tmp_path), name="job_a",
                              clock=lambda: 1.0)
    a.info("first process")
    a.close()
    b = DirectoryOutputLogger(spark, str(tmp_path), name="job_b",
                              clock=lambda: 2.0)
    b.info("second process")
    b.close()
    back = b.read(spark)
    assert back.count() == 2
    assert {r.logger for r in back.collect()} == {"job_a", "job_b"}


def test_read_before_first_flush_is_empty_not_crash(spark, tmp_path):
    """A never-flushed logger must read as an EMPTY typed table (the
    monitor polling the log before the first record lands), not a
    PATH_NOT_FOUND AnalysisException."""
    log = DirectoryOutputLogger(spark, str(tmp_path), clock=lambda: 0.0)
    out = log.read(spark)
    assert out.count() == 0
    assert "level" in out.columns and "message" in out.columns


def test_concurrent_logger_instances_do_not_clobber(spark, tmp_path):
    """Two loggers CONSTRUCTED before either flushes (concurrent jobs
    over one base_dir) must interleave flushes without overwriting:
    the flush index comes from disk at flush time under a lock, not
    from a constructor snapshot — with the snapshot both would target
    flush=0 and the second mode('overwrite') write silently deleted
    the first's records."""
    a = DirectoryOutputLogger(spark, str(tmp_path), name="job_a",
                              clock=lambda: 1.0)
    b = DirectoryOutputLogger(spark, str(tmp_path), name="job_b",
                              clock=lambda: 2.0)
    a.info("from a")
    b.info("from b")
    a.flush()
    b.flush()  # pre-fix: overwrote a's flush=0
    back = b.read(spark)
    assert back.count() == 2
    assert {r.logger for r in back.collect()} == {"job_a", "job_b"}
