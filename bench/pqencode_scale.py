#!/usr/bin/env python3
"""Measured evidence for the Arrow PQ index-build path (pq_encode_arrow).

BENCH/ann_scale.json recorded the expression-form PQ build at ~3k
vecs/s at 1M vectors — the worst number in the ANN family, because
Catalyst evaluates higher-order-function lambdas interpreted
(m × ksub × sub = 8,192 closure steps per vector at production
codebook width). pq_encode_arrow replaces that with three numpy int64
matmuls per subspace inside mapInPandas, same exact arithmetic, same
tie-to-lower-code argmin.

This run times BOTH forms over the same corpus + codebook at each
level and ASSERTS code identity row-for-row before recording the
speedup — a fast encode that drifts from the oracle-gated form would
be a silent index corruption, not a win. The JVM form times encode
ONLY (codebook built and persisted outside the window), so the
comparison is encode-vs-encode, stricter than ann_scale's
codebook+encode `pq_build_sec`.

Writes BENCH/pqencode_scale.json and a marked BENCH/BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

# bench.py at the repo root shadows the bench/ directory for `import
# bench.*`, so sibling bench modules load by file path
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "ann_scale", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "ann_scale.py"))
_ann = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_ann)
DIM, PQ_BM, PQ_BKSUB, PQ_BSUB = _ann.DIM, _ann.PQ_BM, _ann.PQ_BKSUB, _ann.PQ_BSUB
ann_corpus = _ann.ann_corpus

from movement_spark.operators.similarity import (  # noqa: E402
    pq_codebook, pq_encode, pq_encode_arrow)
from movement_spark.session import get_spark       # noqa: E402

SECTION_START = "<!-- pqencode_scale:start -->"
SECTION_END = "<!-- pqencode_scale:end -->"


def _calibration(spark: SparkSession) -> float:
    vals = []
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2654435761L % 1000003) AS s").collect()
        vals.append(time.monotonic() - t0)
    return round(sorted(vals)[1], 3)


def run_level(spark: SparkSession, n_vecs: int) -> dict:
    emb = ann_corpus(spark, n_vecs).persist()
    emb.count()
    cb = pq_codebook(emb, m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB).persist()
    cb.count()

    t0 = time.monotonic()
    jvm = pq_encode(emb, cb, m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB) \
        .withColumnRenamed("codes", "jvm_codes").persist()
    n_jvm = jvm.count()
    t_jvm = time.monotonic() - t0

    t0 = time.monotonic()
    arrow = pq_encode_arrow(emb, cb, m=PQ_BM, ksub=PQ_BKSUB,
                            sub=PQ_BSUB).persist()
    n_arrow = arrow.count()
    t_arrow = time.monotonic() - t0

    # identity gate: every vector present in both, codes equal
    n_same = jvm.join(arrow, "vec_id").where(
        F.col("jvm_codes") == F.col("codes")).count()
    assert n_jvm == n_arrow == n_same == n_vecs, (
        f"arrow/JVM code divergence: jvm={n_jvm} arrow={n_arrow} "
        f"same={n_same} expected={n_vecs}")

    jvm.unpersist(); arrow.unpersist(); cb.unpersist(); emb.unpersist()
    return {
        "n_vecs": n_vecs,
        "dim": DIM,
        "pq_m": PQ_BM,
        "pq_ksub": PQ_BKSUB,
        "jvm_encode_sec": round(t_jvm, 1),
        "arrow_encode_sec": round(t_arrow, 1),
        "jvm_vecs_per_sec": round(n_vecs / t_jvm, 1),
        "arrow_vecs_per_sec": round(n_vecs / t_arrow, 1),
        "speedup": round(t_jvm / t_arrow, 1),
        "codes_identical": True,
    }


def main() -> None:
    sizes = [int(s) for s in os.environ.get(
        "MS_PQENC_VECS", "100000,1000000").split(",")]
    spark = get_spark(app_name="pqencode_scale", master="local[32]",
                      extra_conf={
                          "spark.sql.shuffle.partitions": "128",
                          "spark.driver.memory": "32g",
                          "spark.ui.showConsoleProgress": "false",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    calib_pre = _calibration(spark)

    levels = []
    for n in sizes:
        r = run_level(spark, n)
        print(json.dumps(r))
        levels.append(r)
    calib_post = _calibration(spark)
    spark.stop()

    result = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "calibration_sec_pre": calib_pre,
        "calibration_sec_post": calib_post,
        "levels": levels,
    }
    with open(os.path.join(REPO, "BENCH", "pqencode_scale.json"), "w") as f:
        json.dump(result, f, indent=2)

    rows = "\n".join(
        f"| {r['n_vecs']:,} | {r['jvm_encode_sec']} "
        f"| {r['jvm_vecs_per_sec']:,.0f} | {r['arrow_encode_sec']} "
        f"| {r['arrow_vecs_per_sec']:,.0f} | {r['speedup']}× | yes |"
        for r in levels)
    big = levels[-1]
    section = f"""{SECTION_START}
## PQ index build: Arrow scale path (measured, {result['generated_at']})

`pq_encode_arrow` vs the oracle-gated expression form at production
codebook width (m={PQ_BM}, ksub={PQ_BKSUB}, {DIM}-dim vectors),
encode-only timing over one prebuilt persisted codebook, calibration
pre/post {calib_pre}/{calib_post} s. Code identity is ASSERTED
row-for-row inside the run (and pinned independently by
test_pq_encode_arrow_matches_jvm):

| vectors | JVM encode (s) | JVM vecs/s | Arrow encode (s) | Arrow vecs/s | speedup | codes identical |
|---|---|---|---|---|---|---|
{rows}

- The expression form evaluates m·ksub·sub = {PQ_BM * PQ_BKSUB * (DIM // PQ_BM):,}
  interpreted lambda steps per vector — Catalyst does not codegen
  higher-order-function bodies, so the JVM build is compute-bound at
  ~{big['jvm_vecs_per_sec']:,.0f} vecs/s however wide the cluster's IO is.
- The Arrow form does the same exact int64 L2 argmin as three numpy
  matmuls per subspace against the collected ~64 KB codebook
  ({big['arrow_vecs_per_sec']:,.0f} vecs/s, {big['speedup']}× at
  {big['n_vecs']:,} vectors). It is a narrow zero-shuffle pass, so at
  100 TB the index build parallelizes with the scan; the registry keeps
  the JVM form (plan guardrail: no Python stages in oracle queries) and
  the deployed build uses this one.
- Flat columns on BOTH sides of the Arrow boundary are the enabling
  detail: the first draft shipped the vector as one array<bigint>
  column and measured only 1.4× — Arrow materializes a per-row ndarray
  object for list columns, costing ~10× the matmuls it feeds. The
  deployed form ships dim int64 columns in and m int columns out
  (array re-assembled JVM-side); wall time is then FLAT across a 10×
  corpus growth, i.e. the smaller level is worker-startup-bound.
{SECTION_END}"""

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read() if os.path.exists(md_path) else ""
    if SECTION_START in md and SECTION_END in md:
        pre = md.split(SECTION_START)[0]
        post = md.split(SECTION_END)[1]
        md = pre + section + post
    else:
        md = md.rstrip() + "\n\n" + section + "\n"
    with open(md_path, "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
