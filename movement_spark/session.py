"""SparkSession construction with engine defaults.

The reference sizes its runtime from ``runtime.threads`` (default = #cores,
LocalParallelStreamRuntime.java:85-90). We size shuffle parallelism the same
way and lean on AQE for runtime re-planning. Everything here is plain public
Spark configuration.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from contextlib import contextmanager

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[N], single JVM). On a real cluster
# the same code runs unchanged; shuffle partitions should be ~2-3x total
# cores and maxPartitionBytes left at 128m.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.streaming.stateStore.stateSchemaCheck": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "movement_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    b = SparkSession.builder.appName(app_name).master(master)
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_shipped(spark)
    return spark


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the movement_spark package to executor Python workers.

    Python UDF stages (mapInPandas / applyInPandasWithState) are pickled
    by reference to this module; workers spawned outside the repo cwd
    would fail to import it. This is the programmatic equivalent of
    ``spark-submit --py-files movement_spark.zip`` (north rule) and makes
    the engine work no matter where the driving process started.
    """
    sc = spark.sparkContext
    if getattr(sc, "_movement_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # per-process zip name: a fixed shared path races across processes
    # (a second session truncating the file while the first JVM's file
    # server is still serving it -> workers fetch a torn zip)
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"movement_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._movement_spark_shipped = True


_STATE_PROVIDERS = {
    "rocksdb": ("org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"),
    "hdfs": ("org.apache.spark.sql.execution.streaming.state."
             "HDFSBackedStateStoreProvider"),
}


@contextmanager
def state_backend(spark: SparkSession, backend: str = "rocksdb"):
    """Pin the state-store backend for streaming queries STARTED inside
    the block (the provider is captured at query start and pinned into
    the checkpoint; it cannot change across a resume).

    ``rocksdb`` is the deployment backend for the 100 TB target: state
    lives off-heap/on-disk per executor instead of in the JVM heap, so
    per-key state (open docs in the CEP assembler, join buffers) scales
    with local disk, not memory — with changelog checkpointing enabled
    so per-batch checkpoint cost is the delta, not a full SST upload.
    The sandbox default stays HDFSBacked (in-memory) because at oracle
    scale the RocksDB JNI round trip is pure overhead; this context
    manager is how benches/tests opt pipelines into the scale backend
    and prove result parity between the two.
    """
    if backend not in _STATE_PROVIDERS:
        raise ValueError(
            f"unknown state backend {backend!r} — valid: "
            f"{sorted(_STATE_PROVIDERS)}")
    keys = {
        "spark.sql.streaming.stateStore.providerClass":
            _STATE_PROVIDERS[backend],
    }
    if backend == "rocksdb":
        # changelog checkpointing is a RocksDB-only knob; setting it
        # under the HDFS backend is inert but misleading in conf dumps
        keys["spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled"] = "true"
    prior: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in prior.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally provided session.

    The correctness driver hands us its own SparkSession; timezone must be
    UTC so timestamp-derived values match the DuckDB oracle exactly.
    """
    for k in ("spark.sql.session.timeZone",
              "spark.sql.adaptive.enabled",
              "spark.sql.execution.arrow.pyspark.enabled"):
        try:
            spark.conf.set(k, ENGINE_CONF[k])
        except Exception:
            pass  # immutable in some contexts; UTC is the only hard need
    ensure_shipped(spark)
    return spark
