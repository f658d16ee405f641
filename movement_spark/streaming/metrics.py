"""RuntimeMetrics: the StatusMonitor / io_ops surface re-expressed.

The reference polls per-output AtomicLong counters once per second and
prints: "issued %d total io operations, %d in the last %.2f seconds with
an overall average of %.2f/sec" (Task.java:211-245, CLI.java:29-34).

Spark gives the same signal through StreamingQueryListener progress
events (inputRowsPerSecond, batchDuration, stateOperators) plus
df.observe() metrics flowing through QueryProgress.observedMetrics.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener

STATUS_FORMAT = ("issued %d total io operations, %d in the last %.2f "
                 "seconds with an overall average of %.2f/sec")


def observed(df: DataFrame, name: str = "movement_metrics") -> DataFrame:
    """Attach RuntimeMetrics-style counters to any stage: row count and
    token volume flow into each micro-batch's observedMetrics."""
    cols = df.columns
    metrics = [F.count(F.lit(1)).alias("io_ops")]
    if "n_tok" in cols:
        metrics.append(F.sum("n_tok").alias("tokens"))
    return df.observe(name, *metrics)


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition lineage columns (north rule): physical partition id
    and source file. The WorkChunk-UUID analog is the (file, partition)
    pair — stable, queryable, no driver-side state."""
    cols = [F.spark_partition_id().alias("_partition_id")]
    try:
        df2 = df.withColumn("_source_file", F.col("_metadata.file_path"))
    except Exception:  # not a file-backed scan
        df2 = df.withColumn("_source_file", F.input_file_name())
    return df2.withColumn("_partition_id", cols[0])


@dataclass
class ProgressRecord:
    batch_id: int
    num_input_rows: int
    input_rows_per_sec: float
    duration_ms: int
    observed: dict = field(default_factory=dict)
    state_rows: int = 0
    rows_dropped_late: int = 0
    state_operators: list = field(default_factory=list)
    ts_iso: str = ""  # batch-start wall clock (progress "timestamp")


class RuntimeMetricsListener(StreamingQueryListener):
    """Collects per-batch throughput — the StatusMonitor analog."""

    def __init__(self, log: bool = False):
        self.records: list[ProgressRecord] = []
        self.total_rows = 0
        self.started_at = time.time()
        self._log = log

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event):
        self.started_at = time.time()

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        state_ops = p.get("stateOperators", [])
        state_rows = sum(s.get("numRowsTotal", 0) for s in state_ops)
        dropped = sum(s.get("numRowsDroppedByWatermark", 0)
                      for s in state_ops)
        rec = ProgressRecord(
            batch_id=p.get("batchId", -1),
            num_input_rows=p.get("numInputRows", 0),
            input_rows_per_sec=p.get("inputRowsPerSecond", 0.0) or 0.0,
            duration_ms=p.get("durationMs", {}).get("triggerExecution", 0),
            observed=p.get("observedMetrics", {}),
            state_rows=state_rows,
            rows_dropped_late=dropped,
            state_operators=[s.get("operatorName", "") for s in state_ops],
            ts_iso=p.get("timestamp", ""),
        )
        self.records.append(rec)
        self.total_rows += rec.num_input_rows
        if self._log:
            elapsed = max(time.time() - self.started_at, 1e-9)
            print(STATUS_FORMAT % (
                self.total_rows, rec.num_input_rows,
                rec.duration_ms / 1000.0, self.total_rows / elapsed))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    # StatusMonitor-style summary ---------------------------------------
    def summary(self) -> dict:
        elapsed = max(time.time() - self.started_at, 1e-9)
        return {
            "io_ops": self.total_rows,
            "batches": len(self.records),
            "elapsed_sec": elapsed,
            "avg_rows_per_sec": self.total_rows / elapsed,
            "max_state_rows": max((r.state_rows for r in self.records),
                                  default=0),
            "rows_dropped_late": sum(r.rows_dropped_late
                                     for r in self.records),
        }
