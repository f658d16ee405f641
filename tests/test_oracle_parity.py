"""Local mirror of the driver's correctness gate (CORRECTNESS_r{N}).

Every registered query runs on Spark AND DuckDB at sf0.001; row counts,
column names, and order-insensitive values must match exactly. Streaming
pipelines are included — their final sink contents are compared to the
same SQL oracles as the batch operators.
"""

import pytest

from movement_spark.testing import run_parity
from movement_spark import queries as Q

BATCH = sorted(n for n in Q.queries() if not n.startswith("streaming_"))
STREAMING = sorted(n for n in Q.queries() if n.startswith("streaming_"))


def test_all_queries_have_oracles():
    missing = set(Q.queries()) - set(Q.oracle_sql())
    assert not missing, f"queries without oracle: {missing}"


def test_driver_order_list_is_consistent():
    """_FRONT (the driver-gate evaluation order) must reference only
    live registry names and contain no duplicates — a stale or
    misspelled entry would silently drop the reordering for everything
    after it."""
    front = Q._FRONT
    assert len(front) == len(set(front)), "duplicate names in _FRONT"
    stale = set(front) - set(Q.queries())
    assert not stale, f"_FRONT names not in registry: {stale}"


@pytest.fixture(scope="session")
def batch_parity_results(spark, sf_dir):
    return run_parity(spark, sf_dir, only=BATCH)


def test_batch_parity(batch_parity_results):
    results = batch_parity_results
    assert len(results) == len(BATCH)
    bad = [(r.name, r.detail, r.mismatches[:2]) for r in results if not r.ok]
    assert not bad, f"parity failures: {bad}"


# Clean-host median of the fixed calibration probe below on local[8]
# (warm session; measured 0.36-0.38 s). The budget scales by the live
# probe ratio so a documented uniform hypervisor slowdown (observed up
# to ~1.5x) widens the ceiling instead of tripping it (ADVICE r03).
_CALIB_CLEAN_SEC = 0.35


def _calibration_scale(spark) -> float:
    """Live host-speed factor: the same data-independent CPU probe
    bench.py publishes as calibration_sec (200M codegen'd multiplies,
    median of 3), divided by its pinned clean-host value. >= 1.0 —
    a fast host never SHRINKS the budget."""
    import time
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2654435761L % 1000003) AS s").collect()
        runs.append(time.monotonic() - t0)
    return max(1.0, sorted(runs)[1] / _CALIB_CLEAN_SEC)


def test_batch_query_timing_budget(spark, batch_parity_results):
    """Registry-growth guard: the driver's correctness gate is
    time-boxed (~50 rows/round — it truncated in r01), so neither a
    single query nor the registry as a whole may silently grow
    expensive enough to eat the box (the local sweep tripled in
    wall-clock during round 2). Ceilings at sf0.001 on local[8],
    NORMALIZED by the live calibration probe: 30 s per query — the
    slowest legitimate ones (pagerank's 3 fixed join rounds, BPE's 8
    collect rounds, the first query's cold-session warmup) measure
    2-15 s — and 300 s for the whole batch sweep (measures ~120-190 s;
    the total is the real growth guard). The probe ratio keeps a
    uniform degraded-hypervisor window (every query ~1.5x, observed
    r02/r03) from failing the gate for non-code reasons."""
    scale = _calibration_scale(spark)
    per_query = 30.0 * scale
    over = [(r.name, round(r.spark_sec, 2)) for r in batch_parity_results
            if r.spark_sec > per_query]
    assert not over, (f"batch queries over the {per_query:.0f}s sf0.001 "
                      f"budget (host scale {scale:.2f}): {over}")
    total = sum(r.spark_sec for r in batch_parity_results)
    assert total < 300.0 * scale, (
        f"batch sweep took {total:.0f}s vs {300 * scale:.0f}s budget "
        f"(host scale {scale:.2f}) — registry outgrowing the gate box")


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_parity(spark, sf_dir, name):
    (r,) = run_parity(spark, sf_dir, only=[name])
    assert r.ok, f"{r.detail} {r.mismatches[:3]}"


DEGEN_PARITY_QUERIES = [
    # the operators whose NULL/empty contracts the degenerate corpus
    # exercises: the media carrier + staged-ingest NULL-blob exclusion,
    # the totality-fixed bigram operators, and the funnel/percentile
    # composites over short docs
    "multimodal_feature_stats", "multimodal_resize",
    "multimodal_frame_sample", "multimodal_binary_ingest",
    "doc_novelty_scores", "corpus_filter_manifest",
    "training_set_manifest", "source_quality_percentile_cut",
    # CEP matcher: NULL user/ts/type events are excluded identically in
    # the batch matcher, the stateful streaming matcher, and the oracle
    # (a NULL type crashed the streaming symbol join; NaT poisons the
    # event-time timeout)
    "pattern_match_stats",
    # NULL-doc_id contracts: the state-merge split must be total (NULL
    # rides with the base), the shard/DSIR hashes must agree with the
    # oracle's NULL arithmetic (NULL hash -> NULL shard group in both
    # engines)
    "incremental_state_merge", "shard_shuffle_manifest",
    "dsir_importance_weights",
    # hybrid retrieval: NULL/empty/1-word text contracts of BOTH legs
    # (NULL text -> NULL scores ranked NULLS LAST in both engines;
    # NULL doc_id tie-break pinned to NULLS LAST on the Spark side)
    "hybrid_rrf_retrieval",
    # exact-substring scrub: the NULL-doc_id row makes every derived
    # token quantity NULL — the position generator's if-guard and the
    # oracle's range(GREATEST(...)) must drop the row identically
    "exact_substring_scrub_stats",
]


def test_degenerate_corpus_parity(spark, sf_dir, tmp_path):
    """Oracle parity must hold on a corpus carrying NULL / empty /
    1-word / whitespace documents, not just the clean fixture: this is
    what caught (a) documents_as_media feeding None payloads into the
    Arrow decoders and (b) the feature oracle disagreeing with the
    extractor's empty-payload sentinel (ascii('')=0 vs first_byte=-1,
    list_sum([])=NULL vs 0). Sampled doc_ids (900025 ≡ 0 mod 5 and 25)
    make the NULL doc reach the ingest/frames/resize sample windows."""
    import shutil

    degen = tmp_path / "degen_sf"
    degen.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", degen / f"{t}.parquet")

    def write_single(df, name):
        stage = tmp_path / f"{name}_stage"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        (part,) = stage.glob("part-*.parquet")
        shutil.move(str(part), degen / f"{name}.parquet")

    from pyspark.sql import functions as F

    ev_base = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_extra = spark.createDataFrame(
        [(980001, None, 13, "view", 1.0, '{"k": 1}'),
         (980002, "2024-01-02 00:00:00", None, "click", 2.0, "{}"),
         (980003, "2024-01-02 00:01:00", 14, None, None, None),
         (980005, None, None, None, None, None)],
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_single(ev_base.unionByName(ev_extra.select(*ev_base.columns)),
                 "events")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(900001, "", "en", "src0", 0),
         (900002, "one", "en", "src0", 3),
         (900003, " ", "en", "src1", 1),
         (900004, "two words", "en", "src1", 9),
         (900005, "   leading and  doubled  spaces ", "en", "src2", 32),
         (900006, "x", "de", "src2", 1),
         (900007, None, "en", "src0", 0),
         (900008, "null lang doc with some words here", None, "src1", 34),
         (900025, None, None, "src2", 0),
         (None, "null id doc body words", "en", "src0", 22)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    # DuckDB's read_parquet wants a FILE, not Spark's output dir —
    # write single-part and move the part file into place.
    stage = tmp_path / "docs_stage"
    (base.unionByName(extra).coalesce(1)
     .write.mode("overwrite").parquet(str(stage)))
    (part,) = stage.glob("part-*.parquet")
    shutil.move(str(part), degen / "documents.parquet")
    bad = [(r.name, r.detail, r.mismatches[:2])
           for r in run_parity(spark, str(degen),
                               only=DEGEN_PARITY_QUERIES)
           if not r.ok]
    assert not bad, f"degenerate-corpus parity failures: {bad}"


MALFORMED_VECTOR_QUERIES = [
    # the vector family's malformed-row contract: NULL vectors are
    # excluded at quantized(), wrong-length vectors at the per-dim /
    # assignment seams (sq8 threw INVALID_ARRAY_INDEX; kmeans/semdedup/
    # ivf-incremental silently assigned them and skewed centroids)
    "ann_brute_force_topk", "ann_sq8_topk", "ann_sq8_rerank_topk",
    "kmeans_training_loop", "semantic_dedup_stats",
    "ann_ivf_incremental_lists", "embedding_label_centroids",
    "ann_filtered_topk", "mmr_diversified_topk",
]


def test_malformed_vectors_are_inert(spark, sf_dir, tmp_path):
    """Malformed embedding rows (NULL vector, wrong length, empty,
    NULL label) must have ZERO effect: every vector-family query
    returns byte-identical results with and without them. Weaker than
    oracle parity on purpose — the two engines' NULL-array semantics
    differ on garbage rows, so the portable contract is exclusion, and
    exclusion is exactly what this asserts."""
    import shutil

    degen = tmp_path / "degen_emb"
    degen.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", degen / f"{t}.parquet")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    null_elem = [0.5] * 64  # correct length, one NULL element: dots to
    null_elem[3] = None     # NULL everywhere — must be dropped, never
    extra = spark.createDataFrame(  # silently argmin-assigned to id 0
        [(990001, None, 3),
         (990002, [0.1, 0.2], 1),
         (990003, [], 2),
         (990004, [0.5], None),
         (990005, null_elem, 2)],
        "vec_id bigint, embedding array<float>, label int")
    stage = tmp_path / "emb_stage"
    (base.unionByName(extra).coalesce(1)
     .write.mode("overwrite").parquet(str(stage)))
    (part,) = stage.glob("part-*.parquet")
    shutil.move(str(part), degen / "embeddings.parquet")

    from movement_spark import queries as Q
    qs = Q.queries()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    diverged = []
    for name in MALFORMED_VECTOR_QUERIES:
        if key(qs[name](spark, str(degen)).collect()) != key(
                qs[name](spark, sf_dir).collect()):
            diverged.append(name)
    assert not diverged, f"malformed vectors changed results: {diverged}"
