#!/usr/bin/env python3
"""Micro-bench for the stateful CEP stage (ordered doc assembly).

The per-doc ordered assembly is the engine's flagship CEP stage; this
measures sustained shard-rows/sec through the full streaming stage
(file source → watermark → assembly → keyed sink) for either
implementation:

  MS_CEP_MODE=python  applyInPandasWithState emit-on-complete (default)
  MS_CEP_MODE=jvm     all-JVM session-window aggregate (throughput path)

Measured A/B numbers and the analysis (per-group Python invocation +
state ser/de dominate the Python path; the JVM path is 17× at the
many-docs shape) live in BENCH/BASELINE.md. Run on an idle machine:

  MS_CEP_DOCS=400000 MS_CEP_MODE=jvm python bench/cep_throughput.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movement_spark.benchmarks import cep_assembler_throughput  # noqa: E402
from movement_spark.session import get_spark                    # noqa: E402
from movement_spark.sources.synth import stage_synth_stream     # noqa: E402


def main() -> None:
    n_docs = int(os.environ.get("MS_CEP_DOCS", "400000"))
    mode = os.environ.get("MS_CEP_MODE", "python")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ms_cep_bench", master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ms_cep_")
    stage = os.path.join(work, "stage")
    n_rows = stage_synth_stream(spark, n_docs, stage, n_files=64)
    r = cep_assembler_throughput(
        spark, stage, n_rows,
        sink_dir=os.path.join(work, "sink"),
        checkpoint_dir=os.path.join(work, "ck"),
        mode=mode)
    shutil.rmtree(work, ignore_errors=True)
    r.update({"metric": "cep_assembler_rows_per_sec", "cpus": cpus})
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
