#!/usr/bin/env python3
"""Measured scale evidence for the round-4 text/dataset additions:
hashed_classifier_scores (scan-bound inference), bm25_topk
(postings-bound retrieval), source_cap_manifest (skew-safe two-phase
cap vs the naive one-window form).

Corpus (deterministic, generated inside the JVM from spark.range):
- text: 20-40 words per doc; each position draws u = (doc*a + i*b) mod
  p and renders a vocab word 'w<u%1024>', except three RARE query
  terms at controlled tiers (qa ~0.2% of positions, qb ~0.2%,
  qc ~0.5%) so BM25's idf tiers and the scan-level prune are both
  exercised: only ~1/5 of docs contain ANY query term.
- domain skew for the cap: source 's0' owns 50% of the corpus (the
  giant-domain case the salted two-phase cap exists for), 126 tail
  sources own ~0.4% each; lang fans each source ×4.

The cap comparison runs BOTH forms on the same input in the same host
window and asserts their manifests are IDENTICAL — the ratio is valid
evidence even in a degraded hypervisor window because the two plans
share it.

Writes BENCH/textops_scale.json and a marked section in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window                            # noqa: E402

from movement_spark.operators.dataset import (                   # noqa: E402
    CAP_PRI_ADD, CAP_PRI_MOD, CAP_PRI_MULT, source_cap_manifest,
)
from movement_spark.operators.text import (                      # noqa: E402
    bm25_topk, hashed_classifier_scores,
)
from movement_spark.session import get_spark                     # noqa: E402

SECTION_START = "<!-- textops_scale:start -->"
SECTION_END = "<!-- textops_scale:end -->"

P = 2_147_483_647
QUERY_TERMS = ("qa", "qb", "qc")
CAP = 1_000          # production-ish cap width
CAP_SALT = 16


def text_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, source, lang, n_chars, text) — all-JVM exprs; text is
    only computed when a consumer actually reads it (column pruning
    drops the transform for the cap runs)."""
    u = "((did * 2654435761L + i * 48271L) % 2147483647L)"
    word = (f"case when {u} % 1000 < 2 then 'qa' "
            f"when {u} % 500 = 0 then 'qb' "
            f"when {u} % 200 = 0 then 'qc' "
            f"else concat('w', {u} % 1024) end")
    return (
        spark.range(n_docs).selectExpr("id as did")
        .selectExpr(
            "did as doc_id",
            "if(did % 2 = 0, 's0', concat('s', 1 + did % 127)) as source",
            # the hot domain concentrates in ONE (source, lang) key —
            # the worst case the salted two-phase cap exists for
            "if(did % 2 = 0, 'l0', concat('l', did % 4)) as lang",
            "cast(100 + did % 400 as bigint) as n_chars",
            f"array_join(transform(sequence(0, cast(20 + did % 21 as int)"
            f" - 1), i -> {word}), ' ') as text",
        )
    )


def naive_cap_manifest(documents: DataFrame, cap: int) -> DataFrame:
    """The one-window form of source_cap_manifest (the oracle's shape):
    row_number over the RAW corpus partitioned by the skewed key — the
    plan a 100 TB corpus cannot run, timed here as the comparison
    baseline."""
    pri = F.expr(f"(doc_id * {CAP_PRI_MULT}L + {CAP_PRI_ADD})"
                 f" % {CAP_PRI_MOD}")
    w = Window.partitionBy("source", "lang").orderBy(F.asc("pri"),
                                                     F.asc("doc_id"))
    marked = (documents
              .select("source", "lang", "doc_id", "n_chars",
                      pri.alias("pri"))
              .withColumn("rn", F.row_number().over(w)))
    return (
        marked.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum((F.col("rn") <= cap).cast("int")).cast("bigint")
             .alias("n_kept"),
             F.sum((F.col("rn") > cap).cast("int")).cast("bigint")
             .alias("n_dropped"),
             F.sum(F.when(F.col("rn") <= cap, F.col("n_chars"))
                   .otherwise(0)).cast("bigint").alias("sum_chars_kept"),
             F.sum("n_chars").cast("bigint").alias("sum_chars"))
    )


def run_level(spark: SparkSession, n_docs: int) -> dict:
    docs = text_corpus(spark, n_docs)
    # words per doc averages 30 (20 + did % 21)
    n_words = n_docs * 30

    t0 = time.perf_counter()
    cls_rows = hashed_classifier_scores(docs).collect()
    t_cls = time.perf_counter() - t0
    assert sum(r["n_docs"] for r in cls_rows) == n_docs

    t0 = time.perf_counter()
    prune = " or ".join(
        f"array_contains(split(text, ' '), '{t}')" for t in QUERY_TERMS)
    n_match = docs.where(F.expr(prune)).count()
    t_prune = time.perf_counter() - t0

    t0 = time.perf_counter()
    top = bm25_topk(docs, terms=QUERY_TERMS, k=10).collect()
    t_bm25 = time.perf_counter() - t0
    assert len(top) == 10

    # Skew-safe cap vs the naive window, same input, same host window.
    t0 = time.perf_counter()
    naive = {(r["source"], r["lang"]): (r["n_kept"], r["n_dropped"],
                                        r["sum_chars_kept"])
             for r in naive_cap_manifest(docs, CAP).collect()}
    t_naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    two = {(r["source"], r["lang"]): (r["n_kept"], r["n_dropped"],
                                      r["sum_chars_kept"])
           for r in source_cap_manifest(docs, cap=CAP,
                                        salt=CAP_SALT).collect()}
    t_two = time.perf_counter() - t0
    assert naive == two, "two-phase cap diverged from the naive window"

    return {
        "n_docs": n_docs,
        "n_words": n_words,
        "classifier_sec": round(t_cls, 1),
        "classifier_docs_per_sec": round(n_docs / t_cls, 1),
        "classifier_words_per_sec": round(n_words / t_cls, 1),
        "bm25_prune_matched_docs": n_match,
        "bm25_prune_sec": round(t_prune, 1),
        "bm25_sec": round(t_bm25, 1),
        "bm25_docs_per_sec": round(n_docs / t_bm25, 1),
        "cap": CAP,
        "cap_salt": CAP_SALT,
        "cap_naive_sec": round(t_naive, 1),
        "cap_two_phase_sec": round(t_two, 1),
        "cap_speedup": round(t_naive / t_two, 2),
        "cap_manifests_equal": True,
    }


def main() -> None:
    levels = [int(x) for x in os.environ.get(
        "MS_TEXT_LEVELS", "1000000,4000000").split(",") if x]
    spark = get_spark(
        app_name="ms_textops_scale", master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _calibrate() -> float:
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).selectExpr(
                "sum(id * 2654435761L % 1000003) AS s").collect()
            vals.append(time.perf_counter() - t0)
        return round(sorted(vals)[1], 3)

    calib_pre = _calibrate()
    rows = []
    for n in levels:
        r = run_level(spark, n)
        rows.append(r)
        print(json.dumps(r))
    calib_post = _calibrate()
    spark.stop()

    result = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "calibration_sec_pre": calib_pre,
        "calibration_sec_post": calib_post,
        "levels": rows,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "textops_scale.json"), "w") as f:
        json.dump(result, f, indent=2)

    hdr = ("| docs | classifier (s) | docs/s | BM25 top-10 (s) | "
           "prune keeps | cap naive (s) | cap 2-phase (s) | ratio |")
    sep = "|---|---|---|---|---|---|---|---|"
    lines = [
        f"| {r['n_docs']:,} | {r['classifier_sec']} | "
        f"{r['classifier_docs_per_sec']:,.0f} | {r['bm25_sec']} | "
        f"{r['bm25_prune_matched_docs'] * 100 // r['n_docs']}% | "
        f"{r['cap_naive_sec']} | {r['cap_two_phase_sec']} | "
        f"{r['cap_speedup']}× |"
        for r in rows
    ]
    big = rows[-1]
    section = f"""{SECTION_START}
## Text-ops at scale (measured, {result['generated_at']})

hashed_classifier_scores / bm25_topk / source_cap_manifest on a
deterministic JVM-generated corpus (30-word docs; 3 rare query terms;
source 's0' owns 50% of all docs — the giant-domain skew case),
local[32], calibration pre/post {calib_pre}/{calib_post} s (clean
local[32] band ≈ 0.05-0.08 s — absolute throughputs below are
conservative in a degraded window; the cap ratio compares two plans
inside the SAME window and is window-independent):

{hdr}
{sep}
{chr(10).join(lines)}

- Classifier inference is scan-bound as designed
  ({big['classifier_words_per_sec']:,.0f} words/s at
  {big['n_docs']:,} docs): the per-word char-fold hash + weight lookup
  runs in whole-stage codegen with zero shuffle before the rollup —
  at 100 TB this is IO-parallel, no coordination.
- BM25's scan-level prune keeps
  {big['bm25_prune_matched_docs']:,} of {big['n_docs']:,} docs
  (~{big['bm25_prune_matched_docs'] * 100 // big['n_docs']}%), so the
  explode fan-out and the (doc, term) shuffle see only the postings of
  the query terms — the relational inverted-index bound.
- The salted two-phase cap returns an IDENTICAL manifest to the naive
  one-window form (asserted per run) at {big['cap_speedup']}× the
  speed at {big['n_docs']:,} docs with a 50%-hot key; the gap is the
  hot key's single-task sort, which grows linearly with corpus size
  while the two-phase form's per-task work stays bounded at
  cap × salt per key.
{SECTION_END}"""

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read() if os.path.exists(md_path) else ""
    if SECTION_START in md and SECTION_END in md:
        md = (md.split(SECTION_START)[0] + section
              + md.split(SECTION_END)[1])
    else:
        md = md.rstrip() + "\n\n" + section + "\n"
    with open(md_path, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
