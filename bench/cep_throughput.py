#!/usr/bin/env python3
"""Micro-bench for the stateful CEP stage (ordered_doc_assembler).

The per-doc ordered assembly is the engine's flagship Python stage — the
one applyInPandasWithState boundary in the hot path — so its per-row
cost is tracked separately from the all-JVM pipeline bench. Round 2
replaced the per-row itertuples loop with columnar numpy ops
(operators/ordering.py:_assemble); this script measures the sustained
shard-rows/sec through the full streaming stage (file source → watermark
→ stateful assembly → keyed sink).

Run on an idle machine: MS_CEP_DOCS=400000 python bench/cep_throughput.py
MS_CEP_MODE=jvm switches to the all-JVM session-window assembler
(ordered_doc_assembler_jvm) over the same staged input — the throughput
path the Python stage is compared against in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movement_spark.operators.ordering import ordered_doc_assembler  # noqa: E402
from movement_spark.session import get_spark                         # noqa: E402
from movement_spark.sinks.idempotent import IdempotentKeyedSink      # noqa: E402
from movement_spark.sources.synth import stage_synth_stream          # noqa: E402
from movement_spark.sources.tokens import TS_MOD                     # noqa: E402
from movement_spark.streaming.pipeline import (                      # noqa: E402
    SENTINEL, read_token_stream)

from pyspark.sql import functions as F                               # noqa: E402


def main() -> None:
    n_docs = int(os.environ.get("MS_CEP_DOCS", "400000"))
    mode = os.environ.get("MS_CEP_MODE", "python")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ms_cep_bench", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": "8",
                    "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ms_cep_")
    stage = os.path.join(work, "stage")
    n_rows = stage_synth_stream(spark, n_docs, stage, n_files=64)
    src = read_token_stream(spark, stage, files_per_trigger=16)
    if mode == "jvm":
        from movement_spark.operators.ordering import (
            ordered_doc_assembler_jvm)
        from movement_spark.sources.tokens import EPOCH_2026
        flush_cut = F.timestamp_seconds(F.lit(EPOCH_2026 + TS_MOD + 3600))
        merged = (
            ordered_doc_assembler_jvm(
                src.select("doc_id", "seq", "tokens", "ts"))
            .where(F.col("w.start") < flush_cut)
            .drop("w")
        )
    else:
        shards = src.select("doc_id", "seq", "tokens", "n_shards", "ts")
        merged = (
            ordered_doc_assembler(shards, watermark="10 minutes",
                                  timeout_ms=(TS_MOD + 120) * 1000)
            .where(F.col("doc_id") != SENTINEL)
        )
    sink = IdempotentKeyedSink(os.path.join(work, "sink"), ["doc_id"])
    t0 = time.perf_counter()
    q = (merged.writeStream.outputMode("append")
         .foreachBatch(sink.foreach_batch)
         .option("checkpointLocation", os.path.join(work, "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    elapsed = time.perf_counter() - t0
    docs_out = sink.read(spark).count()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "metric": "cep_assembler_rows_per_sec",
        "mode": mode,
        "value": round(n_rows / elapsed, 1),
        "unit": "rows/sec",
        "rows_in": n_rows,
        "docs_out": docs_out,
        "elapsed_sec": round(elapsed, 3),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
