#!/usr/bin/env python3
"""Measured scale evidence for doc_novelty_scores: the deployed
split-aggregate form against BOTH drafts it replaced — the min-window
attribution draft and the aggregate-and-join-back draft — on the same
input in the same host window (the ratios are window-independent, same
protocol as the cap bench), plus absolute throughput.

Corpus (deterministic, JVM-generated): 30-word docs over a wide vocab
(cross-doc bigram collisions rare), with every 5th doc an exact copy
of its predecessor — so ~20% of docs are late copies that must score
novelty 0 and the rest ~10000. The semantic split is asserted per run:
it holds in any host window or the run is invalid.

Protocol notes (learned from two invalid first attempts):
- The corpus is MATERIALIZED to parquet once per level and every form
  reads it from disk — the operator's real input. Timing the lazily
  generated frame instead charges each form a different number of
  corpus regenerations (the generator's string transform dominates)
  and inverted the ranking.
- The three forms run INTERLEAVED for ``rounds`` rounds and the
  per-form median is compared — back-to-back single shots measured
  the same form at 107.9 s and 36.9 s across two runs on this host,
  so ordering/windowing effects must cancel across forms.

Writes BENCH/novelty_scale.json and a marked BENCH/BASELINE.md section.
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

from movement_spark.operators.dedup import doc_novelty_scores    # noqa: E402
from movement_spark.session import get_spark                     # noqa: E402

SECTION_START = "<!-- novelty_scale:start -->"
SECTION_END = "<!-- novelty_scale:end -->"

WORDS_PER_DOC = 30
VOCAB = 50_021  # prime, wide enough that cross-doc bigram hits are rare


def novelty_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, text): every 5th doc (except 0) repeats its
    predecessor's text exactly — a late copy whose bigrams were all
    first seen one doc earlier."""
    base = "(id - if(id % 5 = 0 and id > 0, 1, 0))"
    # Quadratic mix: a LINEAR word stream makes consecutive words an
    # arithmetic progression, collapsing the bigram space to ~VOCAB
    # values (observed: every "fresh" doc scored ~0). Squaring u mod p
    # breaks the constant stride; u < 2^31 so u*u stays in int64.
    u = f"(({base} * 2654435761L + i * 48271L) % 2147483647L)"
    word = f"concat('w', ({u} * {u}) % 2147483647L % {VOCAB})"
    return spark.range(n_docs).selectExpr(
        "id as doc_id",
        f"array_join(transform(sequence(0, {WORDS_PER_DOC - 1}),"
        f" i -> {word}), ' ') as text",
    )


def _distinct_grams(documents: DataFrame) -> DataFrame:
    """The shared draft prelude: corpus-global DISTINCT (doc, gram)
    pairs — one full exchange before attribution even starts (the
    deployed form dedupes doc-locally with array_distinct instead)."""
    words = (documents.select("doc_id", F.split("text", " ").alias("w"))
             .where(F.size("w") >= 2))
    return words.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> concat(w[i-1], ' ', w[i]))")).alias("gram")
    ).distinct()


def novelty_window_form(documents: DataFrame) -> DataFrame:
    """Draft 1 (shipped briefly): first-occurrence attribution as a
    MIN WINDOW over the gram key — reads the corpus once but pays a
    full SORT of the gram frame inside the window exchange."""
    grams = _distinct_grams(documents)
    first_doc = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        grams.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
             .cast("bigint").alias("n_novel"))
        .withColumn("novelty_bps", F.expr("(n_novel * 10000) div n_grams"))
    )


def novelty_join_form(documents: DataFrame) -> DataFrame:
    """Draft 2: min-aggregate the gram table and join it back.
    Re-explodes the corpus for the aggregate leg and, past broadcast
    size, needs an extra exchange to re-key the (doc, gram) side."""
    grams = _distinct_grams(documents)
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
             .cast("bigint").alias("n_novel"))
        .withColumn("novelty_bps", F.expr("(n_novel * 10000) div n_grams"))
    )


def _summary(rows) -> dict:
    """Collapse per-doc novelty rows to the copy/fresh split."""
    copy = [r for r in rows if r["doc_id"] % 5 == 0 and r["doc_id"] > 0]
    fresh = [r for r in rows if not (r["doc_id"] % 5 == 0
                                     and r["doc_id"] > 0)]
    return {
        "n_docs": len(rows),
        "n_copy": len(copy),
        "copy_zero_share": round(
            sum(1 for r in copy if r["novelty_bps"] == 0) / len(copy), 4),
        "fresh_mean_bps": round(
            sum(r["novelty_bps"] for r in fresh) / len(fresh), 1),
        # share of fresh docs pulled under 8000 bps by chance bigram
        # collisions (grows with corpus size; bounded, never ~1)
        "fresh_low_share": round(
            sum(1 for r in fresh if r["novelty_bps"] < 8000)
            / len(fresh), 4),
    }


def run_level(spark: SparkSession, n_docs: int, rounds: int) -> dict:
    path = f"/tmp/ms_novelty_corpus_{n_docs}"
    novelty_corpus(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_grams = n_docs * (WORDS_PER_DOC - 1)

    key = lambda rows: {(r["doc_id"], r["n_grams"], r["n_novel"])  # noqa: E731
                        for r in rows}

    forms = {"deployed": doc_novelty_scores,
             "window_draft": novelty_window_form,
             "join_draft": novelty_join_form}
    times: dict[str, list[float]] = {name: [] for name in forms}
    keys: dict[str, object] = {}
    dep: dict | None = None
    for _ in range(rounds):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            rows = fn(docs).collect()
            times[name].append(time.perf_counter() - t0)
            if name not in keys:
                keys[name] = key(rows)
                if name == "deployed":
                    dep = _summary(rows)
    assert dep is not None
    # The semantic split must hold in ANY host window: late copies
    # score 0 (their predecessor owns every bigram), fresh docs score
    # high (wide vocab -> rare cross-doc hits).
    assert dep["copy_zero_share"] >= 0.99, dep
    assert dep["fresh_mean_bps"] >= 9000, dep
    assert dep["fresh_low_share"] <= 0.05, dep
    assert keys["deployed"] == keys["window_draft"], "window draft diverged"
    assert keys["deployed"] == keys["join_draft"], "join draft diverged"

    med = {name: sorted(ts)[len(ts) // 2] for name, ts in times.items()}
    t_dep = med["deployed"]
    return {
        "n_docs": n_docs,
        "n_gram_instances": n_grams,
        "rounds": rounds,
        "deployed_sec": round(t_dep, 1),
        "window_draft_sec": round(med["window_draft"], 1),
        "join_draft_sec": round(med["join_draft"], 1),
        "all_runs_sec": {name: [round(t, 1) for t in ts]
                         for name, ts in times.items()},
        "speedup_vs_window": round(med["window_draft"] / t_dep, 2),
        "speedup_vs_join": round(med["join_draft"] / t_dep, 2),
        "docs_per_sec": round(n_docs / t_dep, 1),
        "grams_per_sec": round(n_grams / t_dep, 1),
        **dep,
    }


def main() -> None:
    levels = [int(x) for x in os.environ.get(
        "MS_NOVELTY_LEVELS", "1000000,4000000").split(",") if x]
    spark = get_spark(
        app_name="ms_novelty_scale", master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
            "spark.driver.memory": "32g",
            # derived input: no footer stats, keep Catalyst from
            # broadcasting multi-GB guesses (same note as dedup_scale)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
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
        r = run_level(spark, n, rounds=3 if n <= 1_000_000 else 1)
        rows.append(r)
        print(json.dumps(r))
    calib_post = _calibrate()
    spark.stop()
    import shutil
    for n in levels:
        shutil.rmtree(f"/tmp/ms_novelty_corpus_{n}", ignore_errors=True)

    result = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "calibration_sec_pre": calib_pre,
        "calibration_sec_post": calib_post,
        "levels": rows,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "novelty_scale.json"), "w") as f:
        json.dump(result, f, indent=2)

    hdr = ("| docs | gram instances | rounds | deployed (s) | "
           "window draft (s) | join draft (s) | vs window | vs join | "
           "docs/s |")
    sep = "|---|---|---|---|---|---|---|---|---|"
    lines = [
        f"| {r['n_docs']:,} | {r['n_gram_instances']:,} | {r['rounds']} | "
        f"{r['deployed_sec']} | {r['window_draft_sec']} | "
        f"{r['join_draft_sec']} | {r['speedup_vs_window']}× | "
        f"{r['speedup_vs_join']}× | {r['docs_per_sec']:,.0f} |"
        for r in rows
    ]
    big = rows[-1]
    cmp_ = max((r for r in rows if r["rounds"] >= 3),
               key=lambda r: r["n_docs"], default=rows[0])
    section = f"""{SECTION_START}
## Corpus-novelty scoring at scale (measured, {result['generated_at']})

doc_novelty_scores on a deterministic corpus MATERIALIZED TO PARQUET
(30-word docs, 50k-word vocab, every 5th doc an exact copy of its
predecessor), local[32], calibration pre/post
{calib_pre}/{calib_post} s. The three forms run INTERLEAVED and the
per-form medians are compared (ordering/window effects cancel across
forms; two earlier single-shot protocols inverted the ranking — see
the bench docstring); all forms asserted identical per run.

{hdr}
{sep}
{chr(10).join(lines)}

- The deployed form dedupes grams doc-LOCALLY (array_distinct — no
  corpus-global DISTINCT exchange), runs ONE corpus-sized hash
  aggregate (gram → min doc), and derives n_novel by re-aggregating
  that result — never a join-back, never a sort. Both drafts pay the
  global distinct first; the min-window draft then sorts the whole
  gram frame inside its window exchange
  ({cmp_['speedup_vs_window']}× the deployed median at
  {cmp_['n_docs']:,} docs over {cmp_['rounds']} interleaved rounds),
  and the aggregate-and-join-back draft re-keys the gram frame a
  third time for its merge join ({cmp_['speedup_vs_join']}×).
- Semantics hold at every level: {big['copy_zero_share'] * 100:.1f}%
  of late-copy docs score exactly 0 bps (their predecessor owns every
  bigram); fresh docs average {big['fresh_mean_bps']:,.0f} bps with
  only {big['fresh_low_share'] * 100:.2f}% pulled under 8000 by chance
  bigram collisions (the share grows with corpus size, as expected of
  a fixed vocab).
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
