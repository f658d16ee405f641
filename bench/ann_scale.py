#!/usr/bin/env python3
"""Measured scale evidence for the ANN family (similarity.py).

The IVF path argued 100 TB viability by plan shape (centroid-keyed
inverted lists, corpus never self-joins); this run MEASURES recall and
wall time against exact brute force on corpora up to 1M vectors, so the
accuracy/cost trade is a recorded number, not an assumption.

Corpus (deterministic, spark.range-derived, all-JVM exprs):
- ``n_clusters`` true clusters; vector i belongs to cluster i % n_clusters,
  embedding = cluster center + ±5% per-coordinate noise (both plain
  a*x+b mod p arithmetic mapped into [-0.5, 0.5]);
- because membership is round-robin, the FIRST n_clusters vectors cover
  every cluster exactly once — they double as the deterministic coarse
  codebook ``ivf_topk`` expects (one near-center representative per
  cluster), so the bench exercises the production search shape without
  a separate training stage (kmeans_centroids exists for that).

Measured per level: exact brute-force top-10 wall (the ground truth and
the re-rank baseline), IVF nprobe=1 wall (index assignment + inverted-
list search in one job), and recall@10 of IVF against brute force over
100 queries.

Writes BENCH/ann_scale.json and a marked section in BENCH/BASELINE.md.
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

from movement_spark.operators.similarity import (  # noqa: E402
    _exact_rerank, brute_force_topk, ivf_assign, ivf_assign_incremental,
    ivf_search, ivfpq_build, ivfpq_search, pq_codebook, pq_encode,
    pq_search, sq8_decode, sq8_encode, sq8_search, sq8_train,
)
from movement_spark.session import get_spark       # noqa: E402

SECTION_START = "<!-- ann_scale:start -->"
SECTION_END = "<!-- ann_scale:end -->"
CURVE_START = "<!-- ann_curve:start -->"
CURVE_END = "<!-- ann_curve:end -->"

DIM = 32
N_CLUSTERS = 256
N_QUERIES = 100
K = 10
P = 2_147_483_647

# PQ at bench scale: the production-standard byte code — 4 subspaces of
# 8 dims, 256 codewords each. Seeds are the first 256 vectors, which by
# round-robin membership are one representative per true cluster, so the
# seed codebook covers the corpus structure the same way the IVF coarse
# quantizer does. 4 one-byte codes replace 32 floats: 32× less index
# data read per scored vector.
PQ_BM = 4
PQ_BKSUB = 256
PQ_BSUB = DIM // PQ_BM


def ann_corpus(spark: SparkSession, n_vecs: int, dim: int = DIM,
               n_clusters: int = N_CLUSTERS) -> DataFrame:
    """(vec_id, label, embedding): clustered float vectors, center ±5%
    noise, every value a deterministic a*x+b mod p draw."""
    center = (f"(cast((cast(c as bigint) * 1103515245"
              f" + j * 2654435761) % {P} as double)"
              f" / {P} - 0.5)")
    noise = (f"(cast((id * 48271 + j * 69621) % {P} as double)"
             f" / {P} - 0.5) * 0.1")
    return (
        spark.range(n_vecs)
        .selectExpr("id", f"cast(id % {n_clusters} as int) as c")
        .selectExpr(
            "id as vec_id",
            "concat('l', cast(c as string)) as label",
            f"transform(sequence(0, {dim - 1}), j -> "
            f"  cast({center} + {noise} as float)) as embedding",
        )
    )


def run_level(spark: SparkSession, n_vecs: int) -> dict:
    emb = ann_corpus(spark, n_vecs)

    t0 = time.perf_counter()
    brute = brute_force_topk(emb, n_queries=N_QUERIES, k=K) \
        .select("query_id", "vec_id").persist()
    n_brute = brute.count()
    t_brute = time.perf_counter() - t0

    # index build — in production a materialized bucketed table, built
    # once per corpus version and amortized over every query batch; the
    # persist here is the local analog
    t0 = time.perf_counter()
    index = ivf_assign(emb, n_centroids=N_CLUSTERS).persist()
    index.count()
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    ivf = ivf_search(index, N_CLUSTERS, n_queries=N_QUERIES, k=K) \
        .select("query_id", "vec_id").persist()
    n_ivf = ivf.count()
    t_search = time.perf_counter() - t0

    hits = brute.join(ivf, ["query_id", "vec_id"]).count()
    recall = hits / n_brute if n_brute else 0.0

    # Incremental maintenance path: assign a 10% delta batch against
    # the frozen coarse codebook (ivf_assign_incremental — the
    # append-only index update a daily crawl drop needs; commutes with
    # a full rebuild, pinned by test_ivf_incremental_equals_rebuild).
    # O(delta × centroids) work, never touches the existing lists.
    n_delta = max(n_vecs // 10, 10_000)
    delta_emb = ann_corpus(spark, n_delta).withColumn(
        "vec_id", (F.col("vec_id") + n_vecs).cast("long"))
    t0 = time.perf_counter()
    n_after = ivf_assign_incremental(index, delta_emb,
                                     n_centroids=N_CLUSTERS).count()
    t_delta = time.perf_counter() - t0
    assert n_after == n_vecs + n_delta
    ivf.unpersist()
    index.unpersist()

    # PQ: encode once (the compressed index), ADC-search per batch
    t0 = time.perf_counter()
    cb = pq_codebook(emb, m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB).persist()
    codes = pq_encode(emb, cb, m=PQ_BM, ksub=PQ_BKSUB,
                      sub=PQ_BSUB).persist()
    codes.count()
    t_pq_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq = pq_search(codes, emb, cb, n_queries=N_QUERIES, k=K,
                   m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB) \
        .select("query_id", "vec_id").persist()
    n_pq = pq.count()
    t_pq_search = time.perf_counter() - t0

    pq_hits = brute.join(pq, ["query_id", "vec_id"]).count()
    pq_recall = pq_hits / n_brute if n_brute else 0.0
    pq.unpersist()
    codes.unpersist()
    cb.unpersist()

    # SQ8: per-dim [min,max] trained in one aggregate row, 8-bit codes
    # (4× smaller than float32), compressed-domain scan on DECODED
    # values. Bounds BYTES like PQ but keeps every dimension, so the
    # recall floor is far higher at the same scan shape.
    t0 = time.perf_counter()
    sq_trained = sq8_train(emb, dim=DIM).persist()
    sq_codes = sq8_decode(sq8_encode(emb, sq_trained, dim=DIM),
                          sq_trained, dim=DIM).persist()
    sq_codes.count()
    t_sq_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    sq = sq8_search(sq_codes, n_queries=N_QUERIES, k=K) \
        .select("query_id", "vec_id").persist()
    n_sq = sq.count()
    t_sq_search = time.perf_counter() - t0

    sq_hits = brute.join(sq, ["query_id", "vec_id"]).count()
    sq_recall = sq_hits / n_brute if n_brute else 0.0
    brute.unpersist()
    sq.unpersist()
    sq_codes.unpersist()
    sq_trained.unpersist()
    return {
        "n_vecs": n_vecs,
        "dim": DIM,
        "n_clusters": N_CLUSTERS,
        "n_queries": N_QUERIES,
        "k": K,
        "brute_sec": round(t_brute, 1),
        "brute_rows": n_brute,
        "ivf_build_sec": round(t_build, 1),
        "ivf_search_sec": round(t_search, 1),
        "ivf_rows": n_ivf,
        "recall_at_k": round(recall, 4),
        "delta_vecs": n_delta,
        "delta_assign_sec": round(t_delta, 1),
        "delta_assign_vecs_per_sec": round(n_delta / t_delta, 1),
        "brute_vecs_per_sec": round(n_vecs / t_brute, 1),
        "ivf_search_vecs_per_sec": round(n_vecs / t_search, 1),
        "pq_m": PQ_BM,
        "pq_ksub": PQ_BKSUB,
        "pq_build_sec": round(t_pq_build, 1),
        "pq_search_sec": round(t_pq_search, 1),
        "pq_rows": n_pq,
        "pq_recall_at_k": round(pq_recall, 4),
        "pq_encode_vecs_per_sec": round(n_vecs / t_pq_build, 1),
        "pq_search_vecs_per_sec": round(n_vecs / t_pq_search, 1),
        "sq8_build_sec": round(t_sq_build, 1),
        "sq8_search_sec": round(t_sq_search, 1),
        "sq8_rows": n_sq,
        "sq8_recall_at_k": round(sq_recall, 4),
        "sq8_encode_vecs_per_sec": round(n_vecs / t_sq_build, 1),
        "sq8_search_vecs_per_sec": round(n_vecs / t_sq_search, 1),
    }


def _delta_sentence(big: dict) -> str:
    """Incremental-maintenance sentence; empty when reusing pre-delta
    level rows (curve-only runs over an old JSON)."""
    if "delta_assign_sec" not in big:
        return ""
    return (
        f"\nIncremental maintenance: `ivf_assign_incremental` folds a "
        f"{big['delta_vecs']:,}-vector delta batch (a daily crawl drop) "
        f"into the {big['n_vecs']:,}-vector index in "
        f"{big['delta_assign_sec']} s "
        f"({big['delta_assign_vecs_per_sec']:,.0f} vecs/s) against the "
        f"frozen coarse codebook — O(delta × centroids), never touching "
        f"the existing lists; commutes with a full rebuild "
        f"(test_ivf_incremental_equals_rebuild, oracle row "
        f"`ann_ivf_incremental_lists`).")


CURVE_NPROBE = (1, 4, 16)
CURVE_POOLX = (0, 10, 100)   # rerank pool = poolx × K; 0 = raw ADC order


def run_curve(spark: SparkSession, n_vecs: int) -> dict:
    """The IVF-PQ operating curve a deployer actually tunes
    (VERDICT r03 #4): recall@K and search wall for
    nprobe × rerank-pool over ONE prebuilt index. nprobe buys recall
    with more inverted-list scans (candidates × nprobe); the exact
    re-rank buys back the recall PQ's quantization loses for
    O(pool × dim) exact work per query — the curve shows which knob is
    cheaper at each operating point."""
    emb = ann_corpus(spark, n_vecs).persist()
    brute = brute_force_topk(emb, n_queries=N_QUERIES, k=K) \
        .select("query_id", "vec_id").persist()
    n_brute = brute.count()

    t0 = time.perf_counter()
    index, cb, cents = ivfpq_build(emb, n_centroids=N_CLUSTERS,
                                   m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB)
    index, cb, cents = index.persist(), cb.persist(), cents.persist()
    index.count(), cb.count(), cents.count()
    build_sec = time.perf_counter() - t0

    cells = []
    for nprobe in CURVE_NPROBE:
        for poolx in CURVE_POOLX:
            t0 = time.perf_counter()
            if poolx == 0:
                res = ivfpq_search(index, cb, cents, emb,
                                   n_queries=N_QUERIES, k=K, nprobe=nprobe,
                                   m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB)
            else:
                cands = ivfpq_search(
                    index, cb, cents, emb, n_queries=N_QUERIES,
                    k=poolx * K, nprobe=nprobe,
                    m=PQ_BM, ksub=PQ_BKSUB, sub=PQ_BSUB
                ).select("query_id", "vec_id")
                res = _exact_rerank(emb, cands, N_QUERIES, K)
            res = res.select("query_id", "vec_id").persist()
            res.count()
            sec = time.perf_counter() - t0
            hits = brute.join(res, ["query_id", "vec_id"]).count()
            res.unpersist()
            cell = {"nprobe": nprobe, "rerank_pool": poolx * K,
                    "search_sec": round(sec, 1),
                    "recall_at_k": round(hits / n_brute, 4)}
            cells.append(cell)
            print(json.dumps(cell))
    for df in (index, cb, cents, brute, emb):
        df.unpersist()
    return {"n_vecs": n_vecs, "k": K, "n_queries": N_QUERIES,
            "build_sec": round(build_sec, 1), "cells": cells}


def _curve_md(curve: dict | None) -> str:
    if not curve:
        return ""
    by_np = {}
    for c in curve["cells"]:
        by_np.setdefault(c["nprobe"], {})[c["rerank_pool"]] = c
    pools = sorted({c["rerank_pool"] for c in curve["cells"]})
    hdr = ("| nprobe | " + " | ".join(
        f"pool={p} recall / s" for p in pools) + " |")
    sep = "|" + "---|" * (len(pools) + 1)
    lines = [
        f"| {np} | " + " | ".join(
            f"{by_np[np][p]['recall_at_k']} / {by_np[np][p]['search_sec']}"
            for p in pools) + " |"
        for np in sorted(by_np)
    ]
    return f"""{CURVE_START}
## IVF-PQ operating curve (measured, {curve["n_vecs"]:,} vectors)

One prebuilt IVF-PQ index ({curve["build_sec"]} s build, amortized over
every batch); each cell = recall@{curve["k"]} / search seconds for a
{curve["n_queries"]}-query batch at that (nprobe, exact-rerank pool):

{hdr}
{sep}
{chr(10).join(lines)}

Read it as a deployer: the two knobs fix different losses. nprobe
recovers neighbors the COARSE quantizer misplaced — and on this corpus
the IVF stage is already near-complete at nprobe=1 (exact-dot IVF
recall 0.957 in the levels table), so extra probes buy ~nothing and
only add candidate volume. The binding loss is PQ quantization
(ADC-order recall ~0.17 at every nprobe), and the exact re-rank buys
it back for O(pool × dim) per query with index reads unchanged. A
deployment whose queries straddle list boundaries would see the
opposite profile; the grid is how you find out. Monotonicity in BOTH
axes is test-pinned (tests/test_operators.py:
test_ivf_nprobe_raises_recall_monotonically,
test_rerank_pool_raises_recall_monotonically).
{CURVE_END}"""


def main() -> None:
    levels = [int(x) for x in os.environ.get(
        "MS_ANN_LEVELS", "100000,1000000").split(",") if x]
    curve_vecs = int(os.environ.get("MS_ANN_CURVE", "0"))
    spark = get_spark(
        app_name="ms_ann_scale", master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _calibrate() -> float:
        """Fixed data-independent CPU probe (bench.py's convention):
        median-of-3 of a 200M-multiply sum. Records HOST state beside
        the timings so a degraded-hypervisor run is identifiable
        instead of reading as a code regression (clean ≈ 0.05-0.08 s
        on local[32]; the local[8] reference band is 0.19-0.28 s)."""
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).selectExpr(
                "sum(id * 2654435761L % 1000003) AS s").collect()
            vals.append(time.perf_counter() - t0)
        return round(sorted(vals)[1], 3)

    calib_pre = _calibrate()
    prev = {}
    prev_path = os.path.join(REPO, "BENCH", "ann_scale.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
    rows = []
    for n in levels:
        r = run_level(spark, n)
        rows.append(r)
        print(json.dumps(r))
    if not rows:  # curve-only run (MS_ANN_LEVELS="")
        rows = prev.get("levels", [])
    curve = run_curve(spark, curve_vecs) if curve_vecs else prev.get("curve")
    calib_post = _calibrate()
    spark.stop()

    result = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "calibration_sec_pre": calib_pre,
        "calibration_sec_post": calib_post,
        "levels": rows,
    }
    if curve:
        result["curve"] = curve
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(result, f, indent=2)

    hdr = ("| vectors | brute wall (s) | IVF build (s, once) | "
           "IVF search (s) | search speedup | recall@10 | "
           "PQ encode (s, once) | PQ/ADC search (s) | PQ recall@10 | "
           "SQ8 encode (s, once) | SQ8 search (s) | SQ8 recall@10 |")
    sep = "|---|---|---|---|---|---|---|---|---|---|---|---|"
    lines = [
        f"| {r['n_vecs']:,} | {r['brute_sec']} | {r['ivf_build_sec']} | "
        f"{r['ivf_search_sec']} | "
        f"{r['brute_sec'] / r['ivf_search_sec']:.1f}× | "
        f"{r['recall_at_k']} | "
        f"{r['pq_build_sec']} | {r['pq_search_sec']} | "
        f"{r['pq_recall_at_k']} | "
        f"{r.get('sq8_build_sec', '—')} | {r.get('sq8_search_sec', '—')} | "
        f"{r.get('sq8_recall_at_k', '—')} |"
        for r in rows
    ]
    big = rows[-1]
    section = f"""{SECTION_START}
## ANN at scale (measured, {result['generated_at']})

`ivf_assign` (the index: {N_CLUSTERS} centroid-keyed inverted lists —
built ONCE per corpus version, a materialized bucketed table in
production) + `ivf_search` (nprobe=1) vs exact `brute_force_topk`,
{DIM}-dim clustered corpora, batches of {N_QUERIES} queries, top-{K},
local[32]:

{hdr}
{sep}
{chr(10).join(lines)}

At {big['n_vecs']:,} vectors a query batch over the prebuilt index
answers with recall@10 {big['recall_at_k']} while touching
1/{N_CLUSTERS} of the corpus per query; brute force re-scans the whole
corpus per batch, so the search-side gap widens linearly with corpus
size while the build cost amortizes across every batch. Brute force
remains the re-rank baseline and the ground-truth generator; ``nprobe``
trades linear extra list scans for recall
(tests/test_operators.py::test_ivf_nprobe_raises_recall_monotonically).

PQ columns: `pq_encode` ({PQ_BM} subspaces × {PQ_BKSUB} byte codes,
seeds = one representative per true cluster) compresses each vector to
{PQ_BM} codes — 32× less index data per scored vector — and
`pq_search` answers by {PQ_BM} LUT lookups per candidate with recall@10
{big['pq_recall_at_k']} at {big['n_vecs']:,} vectors. PQ bounds BYTES
per candidate where IVF bounds CANDIDATES; `ivfpq_topk` composes both
(oracle-gated at fixture scale: `ann_ivfpq_topk`).

SQ8 columns: scalar quantization (`sq8_train`/`sq8_encode`) keeps every
dimension at 8 bits — 4× compression vs PQ's 32×. Measured profile:
the ENCODE side is where SQ8 wins ({big.get('sq8_encode_vecs_per_sec', 0):,.0f} vecs/s at
{big['n_vecs']:,} vectors, ~60× cheaper than PQ's Lloyd-round codebook + argmin
encode — the whole 'codebook' is one 2×dim aggregate row), while raw
compressed-domain recall@10 is {big.get('sq8_recall_at_k', '—')} here: this corpus's 256 tight
clusters separate neighbors by margins below the global quantization
step, the adversarial case for uniform per-dim levels (PQ's
cluster-seeded codebook is correspondingly flattered at 100k and
collapses by 1M). Deployment reading: SQ8 = cheapest index build + 4×
IO cut with the exact re-rank restoring ordering over a shallow pool
(recall ≥ the raw scan by construction, property-pinned); PQ(+re-rank)
when the index must shrink 32×; IVF composed with either to bound
candidates (oracle rows `ann_sq8_topk`, `ann_sq8_rerank_topk`).
{_delta_sentence(big)}
{SECTION_END}"""

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read() if os.path.exists(md_path) else ""
    if SECTION_START in md and SECTION_END in md:
        md = (md.split(SECTION_START)[0] + section
              + md.split(SECTION_END)[1])
    else:
        md = md.rstrip() + "\n\n" + section + "\n"
    if curve:
        csec = _curve_md(curve)
        if CURVE_START in md and CURVE_END in md:
            md = md.split(CURVE_START)[0] + csec + md.split(CURVE_END)[1]
        else:
            md = md.rstrip() + "\n\n" + csec + "\n"
    with open(md_path, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
