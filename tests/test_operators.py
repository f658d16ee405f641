"""Operator unit tests: ordering, chunking, two-phase agg, joins."""

from pyspark.sql import functions as F

from movement_spark.operators.chunking import (
    allocate_output_ids, salted_repartition, two_phase_agg,
    partition_skew_report,
)
from movement_spark.operators.ordering import merge_doc_shards
from movement_spark.sources.tokens import token_sequences


def test_merge_order_independent_of_input_order(spark, sf_dir):
    """The PHASE-barrier semantic: merged output depends only on seq
    order, never on arrival order (mirrors the reference's ordered
    two-phase guarantee, Task.java:54-63)."""
    t = token_sequences(spark, sf_dir)
    a = merge_doc_shards(t)
    # scramble arrival order: reverse-sort then repartition arbitrarily
    scrambled = t.orderBy(F.desc("seq"), F.desc("ts")).repartition(13)
    b = merge_doc_shards(scrambled)
    diff = a.join(b, "doc_id") \
        .where(a["merged"] != b["merged"]).count()
    assert diff == 0


def test_merged_concatenation_correct(spark, sf_dir):
    t = token_sequences(spark, sf_dir)
    m = merge_doc_shards(t).where(F.col("doc_id") == "d7").collect()[0]
    shards = sorted(
        t.where(F.col("doc_id") == "d7").select("seq", "tokens").collect())
    expected = [tok for _, toks in shards for tok in toks]
    assert m.merged == expected
    assert m.total_tok == len(expected)


def test_salted_repartition_spreads_hot_key(spark):
    # one hot key owning 90% of rows (FIXTURES.md skew rule)
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id"))
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id"))
    df = hot.unionByName(cold)
    plain = df.repartition(8, F.col("k"))
    plain_max = max(r["count"] for r in partition_skew_report(plain).collect())
    salted = salted_repartition(df, "k", 8, salt_buckets=8)
    salted_max = max(r["count"] for r in partition_skew_report(salted).collect())
    # salting must spread the hot key across multiple partitions
    assert salted_max < plain_max
    assert salted_max <= 9000 * 0.5


def test_two_phase_agg_equals_plain_agg(spark, sf_dir):
    t = token_sequences(spark, sf_dir)
    plain = t.groupBy("doc_id").agg(
        F.sum("n_tok").alias("s"), F.count("*").alias("c"))
    salted = two_phase_agg(
        t, "doc_id",
        {"s": F.sum("n_tok"), "c": F.count("*")}, salt_buckets=4)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_output_ids_unique_gap_free_and_ordered(spark, sf_dir):
    """OutputIdDriver contract (TestDriver.java:95-127: 1000 parallel
    consumers must see 100k UNIQUE ids): the two-phase allocator must
    produce exactly 1..N with no dupes/gaps, in the requested total
    order, across multiple range partitions."""
    t = token_sequences(spark, sf_dir)
    n = t.count()
    ids = allocate_output_ids(t, ["doc_id", "seq"], partitions=8)
    stats = ids.agg(F.min("out_id").alias("lo"),
                    F.max("out_id").alias("hi"),
                    F.countDistinct("out_id").alias("d")).collect()[0]
    assert (stats.lo, stats.hi, stats.d) == (1, n, n)
    # total-order correctness vs the single-partition reference plan
    from pyspark.sql.window import Window
    ref = t.withColumn(
        "ref_id", F.row_number().over(Window.orderBy("doc_id", "seq")))
    joined = ids.join(ref, ["doc_id", "seq"])
    assert joined.where(F.col("out_id") != F.col("ref_id")).count() == 0


def test_output_ids_unique_at_2m(spark):
    """Regression for the range-sampling hazard: RangePartitioner seeds
    its boundary sample from the RDD id, so the counts job and the
    id-assignment job could place boundary rows in DIFFERENT partitions
    when the plan is re-executed — duplicate/gapped ids at exactly the
    scale where sampling stops being exhaustive (~2M rows). The persist
    in allocate_output_ids pins ONE materialized layout for both jobs."""
    n = 2_000_000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % (1 << 33)).alias("k"),
        F.col("id").alias("payload"))
    ids = allocate_output_ids(df, ["k"], partitions=32)
    stats = ids.agg(F.min("out_id").alias("lo"),
                    F.max("out_id").alias("hi"),
                    F.countDistinct("out_id").alias("d"),
                    F.count("*").alias("n")).collect()[0]
    spark.catalog.clearCache()
    assert (stats.lo, stats.hi, stats.d, stats.n) == (1, n, n, n)


def test_output_ids_layout_is_cached(spark, sf_dir):
    """Plan evidence for the single-scan contract: the ranged+numbered
    layout must appear as an InMemoryRelation in the final plan, so the
    join consumes the SAME materialization the counts were taken from."""
    t = token_sequences(spark, sf_dir)
    ids = allocate_output_ids(t, ["doc_id", "seq"], partitions=8)
    plan = ids._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()


def test_assembler_has_no_per_row_python():
    """The stateful assembler is the flagship CEP stage; its per-batch
    work must be columnar (numpy/pandas bulk ops), never row-at-a-time
    Python (VERDICT r01 finding #1)."""
    import inspect

    from movement_spark.operators import ordering
    src = inspect.getsource(ordering)
    for needle in ("itertuples", "iterrows", ".apply(", "for row in"):
        assert needle not in src, f"per-row Python marker {needle!r} found"


def test_validation_split_routes_dead_letters(spark, sf_dir):
    """ErrorHandler policy as data: corrupted rows land on the DLQ path
    WITH their violation reasons; good rows pass through unmarked; the
    two paths partition the input exactly."""
    from movement_spark.operators.validate import split_valid
    t = token_sequences(spark, sf_dir, keep_did=True)
    corrupted = t.withColumn(
        "n_tok", F.col("n_tok") + (F.col("did") % 97 == 0).cast("int"))
    good, bad = split_valid(corrupted, {
        "n_tok_match": F.col("n_tok") == F.size("tokens"),
        "source_present": F.col("source").isNotNull(),
    })
    n_corrupt = corrupted.where(F.col("did") % 97 == 0).count()
    assert bad.count() == n_corrupt > 0
    assert good.count() + bad.count() == corrupted.count()
    assert "_violations" not in good.columns
    reasons = {r.v for r in
               bad.select(F.explode("_violations").alias("v")).collect()}
    assert reasons == {"n_tok_match"}


def test_gap_fill_covers_span_contiguously(spark, sf_dir):
    """Every user's filled series must run contiguously from their first
    to their last active day; gap rows are exact zeros."""
    from movement_spark.operators.windows import gap_fill_daily
    from movement_spark.sources.tables import load_table

    filled = gap_fill_daily(load_table(spark, sf_dir, "events"))
    per_user = (filled.groupBy("user_id")
                .agg(F.count("*").alias("n"),
                     (F.max("day_no") - F.min("day_no") + 1).alias("span"),
                     F.countDistinct("day_no").alias("n_distinct"))
                .collect())
    assert per_user
    for r in per_user:
        assert r.n == r.span == r.n_distinct
    gaps = filled.where(F.col("is_gap") == 1)
    assert gaps.where((F.col("n_events") != 0) |
                      (F.col("day_value") != 0.0)).count() == 0


def test_incident_bin_join_equals_theta_join(spark, sf_dir):
    """The bucketed rewrite must reproduce the naive non-equi join
    exactly (pairs meet once: no dedup pass hides double counting)."""
    from movement_spark.operators.joins import incident_attribution
    from movement_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    fast = incident_attribution(events)
    err = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.unix_timestamp("ts").alias("w_start"))
    probe = events.select(F.col("user_id").alias("u"),
                          F.unix_timestamp("ts").alias("ets"))
    naive = (err.crossJoin(probe)
             .where((F.col("ets") >= F.col("w_start"))
                    & (F.col("ets") < F.col("w_start") + 120))
             .groupBy("incident_id").agg(F.count("*").alias("n_naive")))
    cmp = fast.join(naive, "incident_id", "full")
    assert cmp.where(F.col("n_attributed") != F.col("n_naive")).count() == 0
    assert cmp.where(F.col("n_attributed").isNull() |
                     F.col("n_naive").isNull()).count() == 0


def test_revenue_deciles_partition_customers(spark, sf_dir):
    from movement_spark.operators.relational import revenue_deciles
    from movement_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    rows = revenue_deciles(orders).collect()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_cust for r in rows) == n_cust
    # deciles ordered by revenue: decile 1 holds the max
    by_d = {r.decile: r for r in rows}
    assert by_d[1].min_revenue >= by_d[10].max_revenue


def test_scd2_intervals_chain_per_customer(spark, sf_dir):
    """Exactly one open (is_current) interval per customer, and each
    closed interval ends where the next begins — the SCD2 contract."""
    from movement_spark.operators.relational import order_status_intervals
    from movement_spark.sources.tables import load_table
    from pyspark.sql.window import Window

    iv = order_status_intervals(load_table(spark, sf_dir, "orders"))
    per_cust = iv.groupBy("o_custkey").agg(
        F.sum("is_current").alias("n_open"), F.count("*").alias("n"))
    assert per_cust.where(F.col("n_open") != 1).count() == 0
    w = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    chained = iv.withColumn("nxt_from", F.lead("valid_from").over(w))
    assert chained.where(
        F.col("nxt_from").isNotNull()
        & (F.col("valid_to") != F.col("nxt_from"))).count() == 0


def test_corpus_filter_verdicts_partition_the_corpus(spark, sf_dir):
    from movement_spark.operators.dataset import corpus_filter_manifest
    from movement_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    manifest = corpus_filter_manifest(docs).collect()
    assert sum(r.n_docs for r in manifest) == docs.count()
    allowed = {"exact_dup", "bad_lang", "too_short", "repetitive", "keep"}
    assert {r.verdict for r in manifest} <= allowed
    assert any(r.verdict == "keep" for r in manifest)


def test_pagerank_mass_and_ordering(spark, sf_dir):
    """Rank mass stays within [base-only floor, full scale]; output is
    the deterministic top-20 slice."""
    from movement_spark.operators.graph import (
        PR_SCALE, pagerank_top_tokens, token_transition_edges)
    from movement_spark.sources.tokens import token_sequences

    toks = token_sequences(spark, sf_dir)
    top = pagerank_top_tokens(toks).collect()
    assert len(top) == 20
    prs = [r.pr_final for r in top]
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)
    assert sum(prs) < PR_SCALE
    edges = token_transition_edges(toks)
    n_bigrams = toks.selectExpr(
        "sum(greatest(n_tok - 1, 0)) as nb").collect()[0].nb
    assert edges.agg(F.sum("w")).collect()[0][0] == n_bigrams


def test_zorder_buckets_cluster_both_dims(spark):
    """Z-buckets must span strictly less than the full range in BOTH
    dimensions (the multi-dim pruning win a single-column sort cannot
    give). Needs sf0.01: at sf0.001 the 150-value customer range sits
    entirely below the bucket cut's bit positions."""
    from movement_spark.operators.layout import zorder_layout_stats
    from movement_spark.sources.tables import load_table

    rows = zorder_layout_stats(
        load_table(spark, "/root/testdata/sf0.01", "orders")).collect()
    assert len(rows) > 4
    full_cust = (max(r.max_cust for r in rows)
                 - min(r.min_cust for r in rows))
    full_day = (max(r.max_day for r in rows)
                - min(r.min_day for r in rows))
    # row-weighted mean span must beat the full range in BOTH dims —
    # single-column sorts give ~full span in the other dim
    n = sum(r.n_rows for r in rows)
    mean_cust = sum(r.cust_span * r.n_rows for r in rows) / n
    mean_day = sum(r.day_span * r.n_rows for r in rows) / n
    assert mean_cust < 0.75 * full_cust
    assert mean_day < 0.75 * full_day


def test_rate_anomaly_baseline_and_flags(spark, sf_dir):
    from movement_spark.operators.windows import token_rate_anomalies
    from movement_spark.sources.tokens import token_sequences

    rows = token_rate_anomalies(token_sequences(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        if r.trail_cnt == 0:
            assert r.dev_permille == 1000 and r.is_anomaly == 0
        assert r.is_anomaly == (1 if (r.dev_permille > 1500
                                      or r.dev_permille < 500) else 0)


def test_cohort_retention_offsets_start_at_zero(spark, sf_dir):
    from movement_spark.operators.relational import cohort_retention
    from movement_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    rows = cohort_retention(events).collect()
    assert rows
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 cell of each cohort holds the full cohort population
    zero = {r.cohort: r.n_users for r in rows if r.week_offset == 0}
    later = [r for r in rows if r.week_offset > 0]
    for r in later:
        assert r.n_users <= zero[r.cohort]


def test_label_centroids_shape(spark, sf_dir):
    from movement_spark.operators.similarity import label_centroids
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = label_centroids(emb).collect()
    n_labels = emb.select("label").distinct().count()
    dims = emb.selectExpr("max(size(embedding)) d").collect()[0].d
    assert len(rows) == n_labels * dims
    assert all(r.n_vecs > 0 for r in rows)


def test_pagerank_empty_graph_returns_typed_empty(spark):
    """Empty corpus must give an empty typed rank table, not a driver
    ZeroDivisionError (empty-input robustness sweep, r02)."""
    from movement_spark.operators.graph import pagerank_top_tokens

    empty = spark.createDataFrame(
        [], "doc_id STRING, seq INT, tokens ARRAY<INT>, n_tok INT, "
            "source STRING, ts TIMESTAMP")
    out = pagerank_top_tokens(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["tok", "pr_final"]


def test_triangle_count_golden_and_empty(spark):
    """Hand-computed golden: tokens [1,2,3,4] give skip-gram edges
    {12,23,34,13,24} and exactly the two triangles (1,2,3), (2,3,4);
    an empty corpus yields one all-zero stats row, not a crash."""
    from movement_spark.operators.graph import triangle_count_stats

    schema = ("doc_id STRING, seq INT, tokens ARRAY<INT>, n_tok INT, "
              "source STRING, ts TIMESTAMP")
    one = spark.createDataFrame(
        [("d0", 0, [1, 2, 3, 4], 4, "s", None)], schema)
    row = triangle_count_stats(one).collect()[0]
    assert (row.n_vertices, row.n_edges, row.max_degree,
            row.n_triangles) == (4, 5, 3, 2)
    empty = spark.createDataFrame([], schema)
    erow = triangle_count_stats(empty).collect()[0]
    assert (erow.n_vertices, erow.n_edges, erow.max_degree,
            erow.n_wedges, erow.n_triangles) == (0, 0, 0, 0, 0)


def test_doc_chunking_covers_every_token(spark):
    """Chunk grid invariants at the boundary lengths: n_tok of 1, 32,
    33, 56, 57 need 1, 1, 2, 2, 3 chunks; every sequence is covered
    end-to-end so overlap = chunked volume minus raw volume."""
    from movement_spark.operators.dataset import doc_chunking_stats

    rows = [("d%d" % i, 0, list(range(n)), n, "s", None)
            for i, n in enumerate([1, 32, 33, 56, 57])]
    df = spark.createDataFrame(
        rows, "doc_id STRING, seq INT, tokens ARRAY<INT>, n_tok INT, "
              "source STRING, ts TIMESTAMP")
    out = doc_chunking_stats(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_chunks == 1 + 1 + 2 + 2 + 3
    # chunk lens: [1] [32] [32,9] [32,32] [32,32,9]
    assert r.sum_chunk_tok == 1 + 32 + 41 + 64 + 73
    assert r.n_ragged == 3  # the 1-token seq and the two 9-token tails
    assert r.overlap_tok == r.sum_chunk_tok - (1 + 32 + 33 + 56 + 57)


def test_canonical_manifest_agrees_with_clusters(spark, sf_dir):
    """The manifest's component set must be exactly dup_cluster_labels'
    (same keys, same sizes), its canonical doc a member with the max
    token count, and dropped_tok consistent per component."""
    from movement_spark.operators.dedup import (
        dedup_canonical_manifest, dup_cluster_labels)
    from movement_spark.sources.tokens import token_sequences

    toks = token_sequences(spark, sf_dir, keep_did=True)
    manifest = {r.component: r for r in
                dedup_canonical_manifest(toks).collect()}
    clusters = {r.component: r for r in dup_cluster_labels(toks).collect()}
    assert manifest.keys() == clusters.keys()
    for comp, m in manifest.items():
        assert m.n_docs == clusters[comp].n_docs
        assert m.canon_tok >= 1
        assert m.dropped_tok >= 0


def test_multires_chain_equals_direct_day_agg(spark, sf_dir):
    """The minute→hour→day chain must reproduce a direct day-level
    aggregation of the raw events bit-for-bit."""
    from movement_spark.operators.windows import multires_rollup_chain
    from movement_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
             .cast("double").alias("sum_value"),
             F.countDistinct(F.date_trunc("minute", "ts")).alias(
                 "n_active_minutes"),
             F.countDistinct(F.date_trunc("hour", "ts")).alias(
                 "n_active_hours"))
        .select(F.unix_timestamp("d").alias("ws"), "n_events", "sum_value",
                F.col("n_active_minutes").cast("bigint").alias(
                    "n_active_minutes"),
                F.col("n_active_hours").cast("bigint").alias(
                    "n_active_hours"))
    )
    chained = multires_rollup_chain(ev)
    assert chained.exceptAll(direct).count() == 0
    assert direct.exceptAll(chained).count() == 0


def test_dynamic_gap_keeps_purchase_sessions_open(spark):
    """A purchase at t0 holds the session open 1 h: a click 45 min later
    merges into it; the same 45-min gap after a click starts a NEW
    session (30-min default gap)."""
    from movement_spark.operators.windows import dynamic_gap_sessions

    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 1, "purchase"),
         (2, "2026-01-01 00:45:00", 1, "click"),
         (3, "2026-01-01 00:00:00", 2, "click"),
         (4, "2026-01-01 00:45:00", 2, "click")],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r for r in dynamic_gap_sessions(ev).collect()}
    assert out[1].n_sessions == 1 and out[1].total_events == 2
    assert out[2].n_sessions == 2 and out[2].max_session_events == 1


def test_bfs_empty_graph_returns_typed_empty(spark):
    """Empty corpus must give an empty typed depth profile (same
    contract as the PageRank empty-graph path)."""
    from movement_spark.operators.graph import bfs_depth_profile

    empty = spark.createDataFrame(
        [], "doc_id STRING, seq INT, tokens ARRAY<INT>, n_tok INT, "
            "source STRING, ts TIMESTAMP")
    out = bfs_depth_profile(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "depth", "n_vertices", "min_tok", "max_tok"]


def test_bfs_golden_chain(spark):
    """3-node chain 0→1→2 with seed 0 (0 % 29 == 0): depths are exactly
    {0:[0], 1:[1], 2:[2]} — and a 4th node beyond round 3 is NOT
    reached, pinning the fixed-round bound."""
    from movement_spark.operators.graph import bfs_depth_profile

    # tokens [0,1,2,3,4] → transitions 0→1→2→3→4; seed = token 0
    rows = [("d0", 0, [0, 1, 2, 3, 4], 5, "s", None)]
    toks = spark.createDataFrame(
        rows, "doc_id STRING, seq INT, tokens ARRAY<INT>, n_tok INT, "
              "source STRING, ts TIMESTAMP")
    got = {r.depth: (r.n_vertices, r.min_tok, r.max_tok)
           for r in bfs_depth_profile(toks).collect()}
    assert got == {0: (1, 0, 0), 1: (1, 1, 1), 2: (1, 2, 2), 3: (1, 3, 3)}


def test_pointer_doubling_handles_deep_chains(spark):
    """A 64-vertex path graph (diameter 63) — far beyond the 20-round
    cap that makes plain min-label propagation raise — must fully
    converge under pointer doubling in <= ceil(log2) + const rounds,
    labeling every vertex with the component min. Two disjoint paths
    guard against a single global min masking a merge bug."""
    from movement_spark.operators.graph import connected_components

    n = 64
    verts = spark.range(2 * n).select(F.col("id"))
    chain = spark.range(n - 1)
    edges = chain.select(F.col("id").alias("a"),
                         (F.col("id") + 1).alias("b")) \
        .unionByName(chain.select((F.col("id") + n).alias("a"),
                                  (F.col("id") + n + 1).alias("b")))
    out = connected_components(verts, edges, max_rounds=10)
    got = {(r.id, r.component) for r in out.collect()}
    want = {(i, 0) for i in range(n)} | {(i, n) for i in range(n, 2 * n)}
    assert got == want


def test_lsh_candidates_track_true_dup_structure(spark):
    """Regression pin for the r03 MinHash fixes (independent per-row
    hash coefficients + chained-mod band buckets): on a corpus whose
    duplicate structure is KNOWN — every 10th group of 4 docs is a
    near-dup cluster (6 true pairs each), all other content disjoint —
    the candidate set must track the true pairs, not corpus². The
    pre-fix family (coefficients linear in the row index; positional-
    sum buckets) produced ~1.8-19× designed here and grew superlinearly
    with corpus size (bench/dedup_scale.py measurement)."""
    from movement_spark.operators.dedup import (
        lsh_candidate_pairs, lsh_verified_neardups)

    n, p = 20_000, 2_147_483_647
    toks = (
        spark.range(n).select(F.col("id").alias("did"))
        .selectExpr(
            "concat('d', cast(did as string)) as doc_id",
            "if((did div 4) % 10 = 0, did div 4, 40000 + did) as seed",
            "cast(if((did div 4) % 10 = 0, 100 + (did % 4) * 4, "
            "        80 + (did * 7) % 41) as int) as n_tok")
        .selectExpr(
            "doc_id", "n_tok",
            f"transform(sequence(0, n_tok - 1), i -> "
            f"  cast((((seed * 128 + i) * (seed * 128 + i) % {p})"
            f"        * (seed * 128 + i)) % {p} as int)) as tokens")
    )
    designed = 6 * (n // 40)
    cands = lsh_candidate_pairs(toks, shingle_mod=1_000_003).count()
    assert designed * 0.9 <= cands <= designed * 1.2, \
        f"candidates {cands} vs designed {designed}: LSH noise regressed"
    verified = lsh_verified_neardups(
        toks, shingle_mod=1_000_003, gram_mod=50_021).count()
    assert verified >= designed * 0.95, \
        f"verified {verified} of {designed}: recall regressed"
    assert verified <= cands


def test_ivf_nprobe_raises_recall_monotonically(spark, sf_dir):
    """nprobe is IVF's production recall dial: probing more inverted
    lists must never lose a neighbor the single-list probe found (the
    candidate set only grows), and measured recall vs exact brute force
    must be non-decreasing. nprobe=1 must stay bit-identical to the
    oracle-gated ann_ivf_topk result."""
    from movement_spark.operators.similarity import (
        brute_force_topk, ivf_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, 10, 5).select("query_id", "vec_id").persist()
    total = bf.count()

    def recall(nprobe):
        iv = ivf_topk(emb, 10, 5, nprobe=nprobe) \
            .select("query_id", "vec_id")
        return bf.join(iv, ["query_id", "vec_id"]).count() / total

    r1, r2, r4 = recall(1), recall(2), recall(4)
    bf.unpersist()
    assert r1 <= r2 <= r4, f"recall not monotone in nprobe: {r1} {r2} {r4}"
    assert r4 >= 0.9, f"nprobe=4 recall collapsed: {r4}"


def test_ivf_incremental_equals_rebuild(spark, sf_dir):
    """Append-only IVF maintenance: assigning only the new vectors
    against the frozen codebook and unioning into the index must equal
    a full rebuild over the grown corpus — and a search over the
    incrementally-maintained index must return the rebuild's results
    bit-for-bit. (Holds because the codebook is the first n_centroids
    vectors of the ORIGINAL corpus and stays frozen across appends.)"""
    from movement_spark.operators.similarity import (
        ivf_assign, ivf_assign_incremental, ivf_search)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    old, new = emb.where(F.col("vec_id") <= cut), \
        emb.where(F.col("vec_id") > cut)

    incremental = ivf_assign_incremental(ivf_assign(old), new)
    rebuild = ivf_assign(emb)
    assert incremental.count() == rebuild.count()
    assert incremental.exceptAll(rebuild).count() == 0
    assert rebuild.exceptAll(incremental).count() == 0

    s_inc = ivf_search(incremental, 16, n_queries=8, k=5)
    s_reb = ivf_search(rebuild, 16, n_queries=8, k=5)
    assert s_inc.exceptAll(s_reb).count() == 0
    assert s_reb.exceptAll(s_inc).count() == 0


def test_pq_adc_equals_reconstruction_dot(spark, sf_dir):
    """The ADC invariant that makes PQ search trustworthy: the LUT-sum
    approx_dot must equal the EXACT integer dot of the query against the
    vector's PQ reconstruction (codeword concatenation). If this drifts,
    the LUT indexing or the encode argmin is wrong — recall numbers
    alone would hide either."""
    from movement_spark.operators.similarity import (
        _dot, pq_codebook, pq_encode, pq_search, quantized)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    enc = pq_encode(emb, cb)
    res = pq_search(enc, emb, cb, n_queries=4, k=5)

    recon = enc.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        F.expr("flatten(zip_with(codes, cb, (c, l) -> element_at(l, c + 1)))")
        .alias("rv"))
    queries = quantized(emb).where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv"))
    checked = (
        res.join(recon, "vec_id").join(queries, "query_id")
        .select("query_id", "vec_id", "approx_dot",
                _dot("qv", "rv").alias("exact_recon_dot"))
    )
    rows = checked.collect()
    assert len(rows) == 4 * 5
    bad = [r for r in rows if r.approx_dot != r.exact_recon_dot]
    assert not bad, f"ADC != reconstruction dot: {bad[:3]}"


def test_pq_encode_arrow_matches_jvm(spark, sf_dir):
    """The Arrow/numpy index-build path must produce BYTE-IDENTICAL
    codes to the oracle-gated expression form — same exact int64 L2,
    same tie-to-lower-code argmin. This is the identity that lets the
    deployed build use numpy matmuls (~2 orders of magnitude faster at
    production codebook width) while the registry keeps the JVM form
    under the no-Python plan guardrail. Both forms are restricted to
    exactly-dim vectors here: the arrow path excludes malformed rows by
    contract, the JVM path NULL-pads them into indeterminate codes."""
    from movement_spark.operators.similarity import (
        PQ_M, PQ_SUB, pq_codebook, pq_encode, pq_encode_arrow)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    well_formed = emb.where(F.size("embedding") == PQ_M * PQ_SUB)
    jvm = pq_encode(well_formed, cb).withColumnRenamed("codes", "jvm_codes")
    arrow = pq_encode_arrow(emb, cb)  # excludes malformed rows itself
    joined = jvm.join(arrow, "vec_id", "full").select(
        "vec_id",
        (F.col("jvm_codes") == F.col("codes")).alias("same"))
    rows = joined.collect()
    assert rows, "fixture must have well-formed vectors"
    bad = [r for r in rows if r.same is not True]
    assert not bad, f"arrow codes diverge from JVM codes: {bad[:3]}"


def test_pq_recall_floor_vs_brute_force(spark, sf_dir):
    """PQ trades recall for a 16x smaller corpus representation; the
    trade must stay bounded, and TRAINING the codebook (one Lloyd round
    per subspace) must not be worse than the seed codebook. Floors are
    deliberately loose (4 subspaces x 16 codes is fixture-sized) — this
    catches encode/training regressions that silence the signal, not
    tuning drift. Measured: sf0.001 seed 0.2 / trained 0.22; sf0.01
    seed 0.2 / trained 0.3."""
    from movement_spark.operators.similarity import (
        brute_force_topk, pq_codebook_trained, pq_encode, pq_search,
        pq_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, 10, 5).select("query_id", "vec_id").persist()
    total = bf.count()
    assert total == 50

    seed_hits = bf.join(pq_topk(emb, 10, 5).select("query_id", "vec_id"),
                        ["query_id", "vec_id"]).count()
    cb = pq_codebook_trained(emb)
    trained = pq_search(pq_encode(emb, cb), emb, cb, 10, 5)
    trained_hits = bf.join(trained.select("query_id", "vec_id"),
                           ["query_id", "vec_id"]).count()
    bf.unpersist()
    assert seed_hits / total >= 0.1, f"seed PQ recall: {seed_hits}/{total}"
    assert trained_hits / total >= 0.15, \
        f"trained PQ recall: {trained_hits}/{total}"
    assert trained_hits >= seed_hits, \
        f"Lloyd round made recall WORSE: {trained_hits} < {seed_hits}"


def test_ivfpq_full_probe_equals_pq(spark, sf_dir):
    """IVF-PQ with nprobe = n_centroids probes every inverted list, so
    its candidate set is the whole corpus and the result must be
    bit-identical to plain PQ/ADC search — pins that composing the two
    index layers changes WHICH vectors are scored, never HOW. With
    nprobe=1 the result list can only shrink relative to full probe."""
    from movement_spark.operators.similarity import (
        N_CENTROIDS, ivfpq_topk, pq_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    full = ivfpq_topk(emb, 8, 5, nprobe=N_CENTROIDS)
    pq = pq_topk(emb, 8, 5)
    assert full.exceptAll(pq).count() == 0
    assert pq.exceptAll(full).count() == 0


def test_bpe_learns_composed_merges_on_classic_corpus(spark):
    """Sennrich's canonical example: {low, lower, newest, widest} with
    skewed counts. The learned merges must compose (later ranks build
    on earlier merged symbols) and reproduce the well-known 'est'
    unit; single-letter words must not break the pair transform
    (Spark's sequence(1, 0) descends instead of being empty)."""
    from movement_spark.operators.text import bpe_train

    rows = ([("low",)] * 5 + [("lower",)] * 2
            + [("newest",)] * 6 + [("widest",)] * 3 + [("a",)] * 4)
    docs = spark.createDataFrame(
        [(" ".join(w for (w,) in rows),)], "text string")
    merges = {r["rank"]: (r["left_sym"], r["right_sym"], r["merged"])
              for r in bpe_train(docs, n_merges=5).collect()}
    # round 1: 'es' (9 occurrences: newest 6 + widest 3) beats all
    assert merges[1] == ("e", "s", "es")
    # round 2 composes round 1's output with 't' -> 'est'
    assert merges[2] == ("es", "t", "est")
    # every later merge only references symbols that exist at its turn
    known = set("abcdefghijklmnopqrstuvwxyz")
    for r in sorted(merges):
        left, right, merged = merges[r]
        assert left in known and right in known
        known.add(merged)


def test_bpe_encode_compression_bounds(spark):
    """Encoding with trained merges never increases the token count and
    the compression ratio stays within (0, 10000] basis points."""
    from movement_spark.operators.text import bpe_encode_stats

    docs = spark.createDataFrame(
        [("s1", "banana bandana banana"), ("s2", "band and sand a")],
        "source string, text string")
    out = {r["source"]: r for r in bpe_encode_stats(docs, 4).collect()}
    for r in out.values():
        assert 0 < r["n_tokens"] <= r["n_chars"]
        assert 0 < r["compression_bps"] <= 10000
    assert out["s1"]["n_words"] == 3 and out["s2"]["n_words"] == 4


def test_bpe_matches_pure_python_replica(spark):
    """Engine-independence: the training loop on a pseudo-random corpus
    must match a from-scratch Python replica of the same algebra (word
    counts -> weighted pair counts -> arg-max with count-DESC/pair-ASC
    tie-break -> sentinel-padded leftmost replace to fixpoint)."""
    from collections import Counter
    from movement_spark.operators.text import BPE_PASSES, bpe_train

    def replica(words, n_merges):
        wc = Counter(words)
        syms = {w: " ".join(w) for w in wc}
        out = []
        for rank in range(1, n_merges + 1):
            pc = Counter()
            for w, n in wc.items():
                s = syms[w].split(" ")
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += n
            if not pc:
                break
            (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, l, r, l + r, n))
            pat, rep = f" {l} {r} ", f" {l}{r} "
            for w in syms:
                t = f" {syms[w]} "
                for _ in range(BPE_PASSES):
                    t = t.replace(pat, rep)
                syms[w] = t.strip()
        return out

    # deterministic pseudo-random corpus: 400 words over a 40-word
    # vocabulary of 1-6 letter words, with repeats and repeated letters
    vocab = ["".join(chr(97 + (v * 7 + k * 3) % 5) for k in range((v % 6) + 1))
             for v in range(40)]
    words = [vocab[(i * i + 3 * i) % 40] for i in range(400)]
    docs = spark.createDataFrame(
        [(" ".join(words[:200]),), (" ".join(words[200:]),)], "text string")

    got = [(r["rank"], r["left_sym"], r["right_sym"], r["merged"],
            r["n_occ"]) for r in
           bpe_train(docs, n_merges=6).orderBy("rank").collect()]
    assert got == replica(words, 6)


def test_ivfpq_rerank_full_probe_equals_pq_rerank(spark, sf_dir):
    """Same invariant one composition layer up: with every inverted
    list probed, the IVF-PQ re-rank's ADC pool equals the plain PQ
    re-rank's pool, so the exact re-ranked top-k must be bit-identical
    — the IVF layer changes WHICH vectors pool, never the re-rank."""
    from movement_spark.operators.similarity import (
        N_CENTROIDS, ivfpq_rerank_topk, pq_rerank_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    full = ivfpq_rerank_topk(emb, 6, 4, nprobe=N_CENTROIDS)
    pq = pq_rerank_topk(emb, 6, 4)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, pq.collect()))


def test_rerank_pool_raises_recall_monotonically(spark, sf_dir):
    """The exact re-rank's pool depth is the second dial on the IVF-PQ
    operating curve (bench/ann_scale.py run_curve): re-ranking a deeper
    ADC-proposed pool must never lose recall vs exact brute force —
    with PQ scores the pool ORDER is approximate, so the true neighbor
    at ADC rank 12 is recovered by pool=20 but invisible to pool=5.
    Also pins build/search decomposition: a one-shot ivfpq_topk must be
    bit-identical to ivfpq_search over a prebuilt ivfpq_build index."""
    from movement_spark.operators.similarity import (
        _exact_rerank, brute_force_topk, ivfpq_build, ivfpq_search,
        ivfpq_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, 10, 5).select("query_id", "vec_id").persist()
    total = bf.count()
    index, cb, cents = ivfpq_build(emb)
    index, cb, cents = index.persist(), cb.persist(), cents.persist()

    one_shot = ivfpq_topk(emb, 10, 5, nprobe=2)
    split = ivfpq_search(index, cb, cents, emb, 10, 5, nprobe=2)
    assert one_shot.exceptAll(split).count() == 0
    assert split.exceptAll(one_shot).count() == 0

    def recall(pool):
        cands = ivfpq_search(index, cb, cents, emb, 10, pool, nprobe=2) \
            .select("query_id", "vec_id")
        rr = _exact_rerank(emb, cands, 10, 5).select("query_id", "vec_id")
        return bf.join(rr, ["query_id", "vec_id"]).count() / total

    r5, r20, r80 = recall(5), recall(20), recall(80)
    for df in (index, cb, cents, bf):
        df.unpersist()
    assert r5 <= r20 <= r80, \
        f"recall not monotone in rerank pool: {r5} {r20} {r80}"
    assert r80 > r5, "deeper rerank pool bought no recall at fixture scale"


def test_dsir_selects_target_lang_docs_at_highest_rate(spark, sf_dir):
    """DSIR importance weighting must rank the target domain first: the
    ratio >= 1 selection rate for the target lang must strictly exceed
    every other lang's rate (the synthetic corpus shares most vocabulary
    across langs, so ratios sit near 1e6 — the per-doc vocabulary is
    still enough signal to order the langs), and every lang must appear
    in the manifest."""
    from movement_spark.operators.dataset import (
        DSIR_TARGET_LANG, dsir_importance_weights)
    from movement_spark.sources.tables import load_table

    rows = {r["lang"]: r for r in dsir_importance_weights(
        load_table(spark, sf_dir, "documents")).collect()}
    assert DSIR_TARGET_LANG in rows
    assert len(rows) >= 3, f"degenerate lang split: {sorted(rows)}"
    rate = {lang: r["n_selected"] / r["n_docs"] for lang, r in rows.items()}
    tgt = rate.pop(DSIR_TARGET_LANG)
    assert all(tgt > v for v in rate.values()), \
        f"target rate {tgt} not strictly above {rate}"


def test_duplicate_ngram_coverage_golden(spark):
    """Pins the three semantic edges of the coverage metric on a
    hand-computable corpus: (1) an instance is duplicated only when its
    trigram occurs in >= 2 DISTINCT docs — intra-doc repetition alone
    does not count; (2) every instance of a shared trigram counts in
    its own source's numerator; (3) docs shorter than the gram width
    contribute nothing, so an all-short source is absent entirely."""
    from movement_spark.operators.dedup import duplicate_ngram_coverage

    rows = [
        ("s1", "a", [1, 2, 3, 4], 4),   # (1,2,3) shared; (2,3,4) unique
        ("s1", "b", [1, 2, 3], 3),      # (1,2,3) shared
        ("s2", "c", [7, 7, 7, 7], 4),   # (7,7,7) x2, ONE doc: not dup
        ("s2", "d", [1, 2, 3, 5], 4),   # (1,2,3) shared; (2,3,5) unique
        ("s3", "e", [9], 1),            # too short: source s3 absent
    ]
    toks = spark.createDataFrame(
        rows, "source string, doc_id string, tokens array<int>, n_tok int")
    got = {r["source"]: r for r in duplicate_ngram_coverage(toks).collect()}
    assert set(got) == {"s1", "s2"}
    assert (got["s1"]["total_ngrams"], got["s1"]["dup_ngrams"],
            got["s1"]["dup_bps"]) == (3, 2, 6666)
    assert (got["s2"]["total_ngrams"], got["s2"]["dup_ngrams"],
            got["s2"]["dup_bps"]) == (4, 1, 2500)


def test_dup_span_scrub_golden(spark):
    """Pins the scrub semantics the manifest depends on: (1) covered
    positions UNION across overlapping duplicated trigrams (doc b's two
    overlapping shared trigrams remove 4 tokens, not 6); (2) the census
    is per-DOC, so intra-doc repetition (doc c) and a doc's own other
    shard never scrub anything; (3) untouched and too-short sources
    still appear with 0 removed; (4) positions key by (doc_id, seq) —
    the same offset in two shards counts twice."""
    from movement_spark.operators.dedup import dup_span_scrub

    rows = [
        ("s1", "a", 0, [1, 2, 3, 4], 4),    # (1,2,3) shared -> pos 0,1,2
        ("s1", "a", 1, [1, 2, 3], 3),       # same gram, other shard -> 0,1,2
        ("s1", "b", 0, [5, 1, 2, 3, 4], 5), # (1,2,3)+(2,3,4) overlap -> 1..4
        ("s2", "c", 0, [7, 7, 7, 7], 4),    # intra-doc repeat: not dup
        ("s3", "e", 0, [9], 1),             # too short: 0 removed
    ]
    toks = spark.createDataFrame(
        rows,
        "source string, doc_id string, seq int, tokens array<int>, "
        "n_tok int")
    got = {r["source"]: r for r in dup_span_scrub(toks).collect()}
    assert set(got) == {"s1", "s2", "s3"}
    r1 = got["s1"]
    # Both (1,2,3) and (2,3,4) occur in docs a AND b. Covered unions:
    # a/shard0 {0,1,2}+{1,2,3} -> 4; a/shard1 {0,1,2} -> 3;
    # b {1,2,3}+{2,3,4} -> 4 (naive 3x-instances would say 6). Sum 11.
    assert (r1["n_docs"], r1["total_tokens"], r1["docs_scrubbed"],
            r1["removed_tokens"]) == (2, 12, 2, 11)
    assert r1["removed_bps"] == 11 * 10000 // 12
    assert (got["s2"]["removed_tokens"], got["s2"]["docs_scrubbed"]) == (0, 0)
    assert (got["s3"]["removed_tokens"], got["s3"]["removed_bps"]) == (0, 0)


def test_exact_substring_scrub_golden(spark):
    """Pins the exact-substring (Lee et al.) semantics at k=4 on a
    hand-computable corpus: (1) a >= k repeated span scrubs ALL its
    positions — a 5-token shared run covers 5 positions via two
    overlapping k-gram instances, unioned not summed; (2) a k-1-length
    shared run scrubs NOTHING (the exactness boundary a trigram-width
    census cannot express); (3) INSTANCE-count semantics: one doc
    self-repeating a k-run across shards IS scrubbed (unlike the
    per-doc dup_span_scrub census); (4) too-short shards and untouched
    sources report 0, never vanish."""
    from movement_spark.operators.dedup import exact_substring_scrub

    rows = [
        # 5-token run 1..5 shared between docs a and b
        ("s1", "a", 0, [1, 2, 3, 4, 5, 9], 6),
        ("s1", "b", 0, [8, 1, 2, 3, 4, 5], 6),
        # k-1 run 21..23 shared with doc a? no — craft: 3-token run
        # 31,32,33 shared between c and d: below k, never scrubbed
        ("s2", "c", 0, [31, 32, 33, 41, 42], 5),
        ("s2", "d", 0, [31, 32, 33, 51, 52], 5),
        # doc e repeats its own 4-run across two shards: instance
        # count >= 2 corpus-wide -> scrubbed (paper semantics)
        ("s3", "e", 0, [61, 62, 63, 64], 4),
        ("s3", "e", 1, [61, 62, 63, 64], 4),
        ("s4", "f", 0, [71, 72], 2),  # shorter than k: inert
        # (5) two SOURCES carrying the same (doc_id, seq) — all three
        # g/h instances are candidates, so the phase-2 rejoin sees the
        # cross-source key collision and must match each candidate to
        # its OWN shard's tokens (the full (source, doc_id, seq) key)
        ("s5", "g", 0, [70, 81, 82, 83, 84], 5),
        ("s5", "h", 0, [81, 82, 83, 84], 4),
        ("s6", "g", 0, [81, 82, 83, 84], 4),
        # (6) NULL-doc_id shards sharing a k-run: the census counts
        # them, so the rejoin must be NULL-SAFE — a plain equi-join
        # would silently drop the key and undercount vs the
        # single-phase oracle form
        ("s7", None, 0, [55, 56, 57, 58], 4),
        ("s7", None, 1, [55, 56, 57, 58], 4),
    ]
    toks = spark.createDataFrame(
        rows,
        "source string, doc_id string, seq int, tokens array<int>, "
        "n_tok int")
    got = {r["source"]: r
           for r in exact_substring_scrub(toks, k=4).collect()}
    assert set(got) == {"s1", "s2", "s3", "s4", "s5", "s6", "s7"}
    # s5: g covers pos 1..4, h covers 0..3; s6: g covers 0..3
    assert (got["s5"]["docs_scrubbed"], got["s5"]["removed_tokens"]) \
        == (2, 8)
    assert (got["s6"]["docs_scrubbed"], got["s6"]["removed_tokens"]) \
        == (1, 4)
    # s7: both NULL-doc_id shards fully covered (countDistinct skips
    # NULL, so docs_scrubbed stays 0 — the removed count is the signal)
    assert (got["s7"]["docs_scrubbed"], got["s7"]["removed_tokens"]) \
        == (0, 8)
    # s1: a covers {0..4} (grams at p=0,1 union), b covers {1..5}: 10
    assert (got["s1"]["docs_scrubbed"], got["s1"]["removed_tokens"],
            got["s1"]["removed_bps"]) == (2, 10, 10 * 10000 // 12)
    # s2: only a 3-token overlap — no 4-gram repeats anywhere
    assert (got["s2"]["docs_scrubbed"], got["s2"]["removed_tokens"]) == (0, 0)
    # s3: e's two shards are the two instances of one exact 4-gram
    assert (got["s3"]["docs_scrubbed"], got["s3"]["removed_tokens"]) == (1, 8)
    assert (got["s4"]["removed_tokens"], got["s4"]["removed_bps"]) == (0, 0)


def test_semantic_dedup_golden(spark):
    """Pins the SemDeDup semantics: (1) near-dup pairs are counted ONLY
    within a k-means cluster — v5 is cosine-opposite to everything yet
    lands in c1, and its (1,5) pair dies on dot > 0, (4,5) on the
    threshold; (2) keep-first pruning — a vector is pruned iff a
    LOWER-id same-cluster vector clears cos >= p/q (v2,v3 pruned
    against v0; v4 against v1); (3) assignment is the final Lloyd-round
    assignment (k=2 seeds = v0,v1; one round)."""
    from movement_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [0.9, 0.1], 0),     # near v0 -> c0, pruned by v0
        (3, [0.95, 0.05], 0),   # near v0 -> c0, pruned by v0
        (4, [-0.1, 0.9], 0),    # near v1 -> c1, pruned by v1
        (5, [-1.0, 0.0], 0),    # c1 by L2 but cos <= 0 / 0.11: kept
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    got = {r["cluster"]: r
           for r in semantic_dedup(emb, k=2, iters=1).collect()}
    assert set(got) == {0, 1}
    r0, r1 = got[0], got[1]
    assert (r0["n_vecs"], r0["n_pairs"], r0["n_pruned"]) == (3, 3, 2)
    assert r0["pruned_bps"] == 2 * 10000 // 3
    assert (r1["n_vecs"], r1["n_pairs"], r1["n_pruned"]) == (3, 1, 1)
    assert r1["pruned_bps"] == 1 * 10000 // 3


def test_top_ngram_fraction_golden(spark):
    """Pins the max-frequency rule: (1) frac = top_count * 2 * 1000 div
    total tokens ACROSS shards — doc a's top bigram (1,2) appears 3x
    over 2 shards of 10 tokens total -> 600; (2) the self-overlap
    artifact can push past 1000 (doc b "7 7 7 7" -> top (7,7) x3 over 4
    tokens -> 1500); (3) a 1-token doc has no bigram and is out of
    scope entirely (s3 absent); (4) flagging uses >= flag_x1000."""
    from movement_spark.operators.text import top_ngram_fraction

    rows = [
        ("s1", "a", 0, [1, 2, 9, 1, 2], 5),
        ("s1", "a", 1, [1, 2, 8, 8, 8], 5),   # (1,2) 3x total; (8,8) 2x
        ("s2", "b", 0, [7, 7, 7, 7], 4),      # (7,7) 3x / 4 tok -> 1500
        ("s3", "e", 0, [9], 1),               # no bigram: out of scope
    ]
    toks = spark.createDataFrame(
        rows,
        "source string, doc_id string, seq int, tokens array<int>, "
        "n_tok int")
    got = {r["source"]: r
           for r in top_ngram_fraction(toks, flag_x1000=700).collect()}
    assert set(got) == {"s1", "s2"}
    assert (got["s1"]["n_docs"], got["s1"]["n_flagged"],
            got["s1"]["sum_frac_x1000"], got["s1"]["max_frac_x1000"]) == \
        (1, 0, 600, 600)
    assert (got["s2"]["n_docs"], got["s2"]["n_flagged"],
            got["s2"]["sum_frac_x1000"], got["s2"]["max_frac_x1000"]) == \
        (1, 1, 1500, 1500)


def test_shard_signature_expr_dialects_agree(spark):
    """The streaming monitor's per-shard signature is emitted for BOTH
    engines from one coefficient loop (dedup.shard_signature_expr) —
    this pins the dialect pair at a NON-fixture shingle width (the
    production path oracle parity never exercises), and the NULL fold
    for the sentinel's empty array."""
    import duckdb

    from movement_spark.operators.dedup import shard_signature_expr

    rows = [(list(range(1, 40)),), ([7, 7, 7, 1 << 20],), ([],), (None,)]
    toks = spark.createDataFrame(rows, "tokens array<int>")
    got_spark = [
        r["sig"] for r in
        toks.select(F.expr(shard_signature_expr(
            "spark", shingle_mod=1_000_003)).alias("sig")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (tokens INT[])")
    for (arr,) in rows:
        con.execute("INSERT INTO t VALUES (?)", [arr])
    got_duck = [r[0] for r in con.execute(
        f"SELECT {shard_signature_expr('duckdb', shingle_mod=1_000_003)}"
        " AS sig FROM t").fetchall()]
    assert got_spark == got_duck
    assert got_spark[2] is None and got_spark[3] is None
    assert got_spark[0] != got_spark[1]


def test_source_cap_two_phase_equals_naive(spark, sf_dir):
    """The salted two-phase cap must equal the naive one-window cap on
    ANY physical layout (the oracle proves it on DuckDB; this pins it
    against a hostile repartitioning on the Spark side) and must
    exercise both branches: some (source, lang) groups above the cap,
    some at-or-below it."""
    from pyspark.sql.window import Window

    from movement_spark.operators.dataset import (
        CAP_PER_KEY, CAP_PRI_ADD, CAP_PRI_MOD, CAP_PRI_MULT,
        source_cap_manifest)
    from movement_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(13, "doc_id")
    got = {(r["source"], r["lang"]): (r["n_kept"], r["n_dropped"],
                                      r["sum_chars_kept"])
           for r in source_cap_manifest(docs).collect()}

    pri = F.expr(f"(doc_id * {CAP_PRI_MULT}L + {CAP_PRI_ADD}) % {CAP_PRI_MOD}")
    w = Window.partitionBy("source", "lang").orderBy(F.asc("pri"),
                                                     F.asc("doc_id"))
    naive = (docs.select("source", "lang", "doc_id", "n_chars",
                         pri.alias("pri"))
             .withColumn("rn", F.row_number().over(w))
             .groupBy("source", "lang")
             .agg(F.sum((F.col("rn") <= CAP_PER_KEY).cast("int")).alias("k"),
                  F.sum((F.col("rn") > CAP_PER_KEY).cast("int")).alias("d"),
                  F.sum(F.when(F.col("rn") <= CAP_PER_KEY,
                               F.col("n_chars")).otherwise(0)).alias("c")))
    want = {(r["source"], r["lang"]): (r["k"], r["d"], r["c"])
            for r in naive.collect()}
    assert got == want
    assert any(v[1] > 0 for v in got.values()), "no group above the cap"
    assert any(v[1] == 0 for v in got.values()), "no group under the cap"


def test_sq8_codes_are_8bit_and_span_range(spark, sf_dir):
    """Every SQ8 code is in [0, 255]; the trained range is tight (some
    dim codes to 0 AND to 255 — the min and max vectors themselves)."""
    from movement_spark.operators.similarity import sq8_encode, sq8_train
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    coded = sq8_encode(emb, sq8_train(emb))
    stats = coded.select(
        F.expr("array_min(code)").alias("lo"),
        F.expr("array_max(code)").alias("hi")).agg(
        F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == 255


def test_sq8_rerank_recall_beats_compressed_scan(spark, sf_dir):
    """Composing the exact re-rank on the SQ8 pool must not lower
    recall vs the plain compressed scan (ground truth = brute force),
    and SQ8's small per-dim error should land recall near-exact."""
    from movement_spark.operators.similarity import (
        brute_force_topk, sq8_rerank_topk, sq8_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb).collect()}
    raw = {(r["query_id"], r["vec_id"]) for r in sq8_topk(emb).collect()}
    rr = {(r["query_id"], r["vec_id"])
          for r in sq8_rerank_topk(emb).collect()}
    assert len(rr & truth) >= len(raw & truth)
    assert len(rr & truth) >= int(0.9 * len(truth))


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    """BM25 semantics on a constructed corpus: with equal tf and equal
    doc length, the doc matching the RARER query term scores higher
    (idf dominates); a doc matching two terms outranks both."""
    from movement_spark.operators.text import bm25_topk

    rows = [(0, "dup alpha beta gamma"),        # rare term, tf=1
            (1, "merge alpha beta gamma"),      # common term, tf=1
            (2, "dup merge beta gamma")]        # both terms
    rows += [(i, "merge alpha beta gamma") for i in range(3, 10)]
    rows += [(i, "alpha beta gamma delta") for i in range(10, 40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["rank"], r["score"])
           for r in bm25_topk(docs, terms=("dup", "merge"), k=10).collect()}
    assert got[2][0] == 1, "two-term doc must rank first"
    assert got[0][1] > got[1][1], "rare-term doc must outscore common"


def test_classifier_is_single_rollup_no_extra_shuffle(spark, sf_dir):
    """The classifier inference pass is one scan + one map-side-combined
    rollup: exactly one Exchange in the plan, zero Python stages."""
    from movement_spark.operators.text import hashed_classifier_scores
    from movement_spark.plans.audit import explain_text, plan_audit
    from movement_spark.sources.tables import load_table

    df = hashed_classifier_scores(load_table(spark, sf_dir, "documents"))
    txt = explain_text(df)
    assert txt.count("Exchange") <= 2, "classifier must not add shuffles"
    assert plan_audit(df)["python_stages"] == 0


def test_small_qty_revenue_matches_correlated_subquery(spark, sf_dir):
    """The Q17-shape rewrite (per-part aggregate joined back) must
    equal the literal correlated-subquery formulation Spark would
    otherwise evaluate as a rewritten join anyway — pinned so the
    float-free qty·5·n < sum form stays equivalent to qty < sum/(5n)."""
    from movement_spark.operators.relational import (
        small_quantity_part_revenue)
    from movement_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    li.createOrReplaceTempView("li_q17")
    part.createOrReplaceTempView("part_q17")
    want = {r["p_brand"]: (r["n"], r["rev"]) for r in spark.sql("""
        SELECT p_brand, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS rev
        FROM li_q17 l JOIN part_q17 ON l_partkey = p_partkey
        WHERE CAST(l_quantity AS BIGINT) * 5 *
              (SELECT COUNT(*) FROM li_q17 i
               WHERE i.l_partkey = l.l_partkey)
              < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM li_q17 i
                 WHERE i.l_partkey = l.l_partkey)
        GROUP BY p_brand""").collect()}
    got = {r["p_brand"]: (r["n_small_lines"], r["small_qty_revenue"])
           for r in small_quantity_part_revenue(li, part).collect()}
    assert got == want


def test_epoch_schedule_conserves_budget_and_caps(spark, sf_dir):
    """Schedule invariants: served ≤ budget, shortfall is the exact
    remainder, capped ⟺ the epoch cap bound, and the fixture corpus
    exercises BOTH branches (some sources capped, some budget-bound)."""
    from movement_spark.operators.dataset import (
        EPOCH_CAP_X1000, epoch_schedule_manifest)
    from movement_spark.sources.tables import load_table

    rows = epoch_schedule_manifest(
        load_table(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tokens_served"] <= r["budget_tokens"]
        assert r["shortfall"] == r["budget_tokens"] - r["tokens_served"]
        assert r["capped"] == int(r["epochs_x1000"] == EPOCH_CAP_X1000)
        assert r["epochs_x1000"] <= EPOCH_CAP_X1000
    assert any(r["capped"] for r in rows), "no source hit the cap"
    assert any(not r["capped"] for r in rows), "every source capped"


def test_hard_negatives_bounded_by_unfiltered_brute_force(spark, sf_dir):
    """Hard-negative invariants: no returned neighbor carries the
    query's label, ranks are dense per query, and each query's best
    hard-negative dot is ≤ its best unfiltered-neighbor dot (the label
    filter only removes candidates — if this breaks, the filter moved
    somewhere that changes scores, not membership)."""
    from movement_spark.operators.similarity import (
        brute_force_topk, hard_negative_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    hard = hard_negative_topk(emb).collect()
    assert hard, "no hard negatives at test SF"
    assert all(r["neg_label"] != r["query_label"] for r in hard)
    by_q = {}
    for r in hard:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1))
    best_any = {r["query_id"]: r["dot"]
                for r in brute_force_topk(emb).collect() if r["rank"] == 1}
    for q, rows in by_q.items():
        assert max(r["dot"] for r in rows) <= best_any[q]


def test_large_volume_plan_broadcasts_sliver_and_shuffles_fact_once(
        spark, sf_dir):
    """Q18's scale contract: the per-order aggregate is the ONLY
    hash-partition exchange in the plan (the fact shuffles once); the
    filtered sliver reaches both probes as broadcast hash joins and no
    sort-merge join appears."""
    from movement_spark.operators.relational import large_volume_customers
    from movement_spark.sources.tables import load_table

    df = large_volume_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_truncated_rerank_recall_beats_prefix_scan(spark, sf_dir):
    """Same recall-floor contract as SQ8 (the class of oracle-invisible
    semantic bug both engines can agree on): exact re-rank on the
    prefix-scan pool must not lower recall vs the prefix scan alone,
    and deepening the pool must not lower re-rank recall. No near-exact
    floor here — this corpus's tight clusters pack little mass into the
    16-dim prefix (measured 0.14 prefix-only / 0.32 reranked at
    sf0.001), which is exactly why the deployed form is the rerank."""
    from movement_spark.operators.similarity import (
        brute_force_topk, truncated_rerank_topk, truncated_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb).collect()}
    raw = {(r["query_id"], r["vec_id"])
           for r in truncated_topk(emb).collect()}
    rr20 = {(r["query_id"], r["vec_id"])
            for r in truncated_rerank_topk(emb).collect()}
    rr40 = {(r["query_id"], r["vec_id"])
            for r in truncated_rerank_topk(emb, pool=40).collect()}
    assert len(rr20 & truth) >= len(raw & truth)
    assert len(rr40 & truth) >= len(rr20 & truth)


def test_dominant_suppliers_match_correlated_subquery(spark, sf_dir):
    """The Q20-shape rewrite (one (part,supplier) aggregate, per-part
    totals re-aggregated from it, 2·q > total) must equal the literal
    correlated-subquery formulation of Q20's availability threshold —
    pinned so the integer half test stays equivalent to q > 0.5·sum."""
    from movement_spark.operators.relational import dominant_part_suppliers
    from movement_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    for df, name in ((li, "li_q20"), (part, "part_q20"),
                     (supplier, "supp_q20"), (nation, "nat_q20")):
        df.createOrReplaceTempView(name)
    want = {(r["s_suppkey"], r["n"]) for r in spark.sql("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS BIGINT)) AS q
          FROM li_q20 JOIN part_q20 ON l_partkey = p_partkey
          WHERE p_name LIKE 'cold %'
            AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
          GROUP BY 1, 2)
        SELECT s_suppkey, COUNT(*) AS n
        FROM ps JOIN supp_q20 ON l_suppkey = s_suppkey
        WHERE q > 0.5 * (SELECT SUM(q) FROM ps i
                         WHERE i.l_partkey = ps.l_partkey)
        GROUP BY 1""").collect()}
    got = {(r["s_suppkey"], r["n_dominant_parts"])
           for r in dominant_part_suppliers(li, part, supplier,
                                            nation).collect()}
    assert got == want and got


def test_supplier_relation_counts_match_not_in_subquery(spark, sf_dir):
    """The Q16-shape rewrite (broadcast left-anti complaint set, plain
    COUNT on the already-distinct relation) must equal the literal
    NOT IN + COUNT(DISTINCT) formulation."""
    from movement_spark.operators.relational import supplier_relation_counts
    from movement_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    for df, name in ((li, "li_q16"), (part, "part_q16"),
                     (supplier, "supp_q16")):
        df.createOrReplaceTempView(name)
    want = {(r["p_brand"], r["p_type"], r["p_size"]): r["n"]
            for r in spark.sql("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS n
        FROM li_q16 JOIN part_q16 ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
          AND p_size IN (9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supp_q16
                                WHERE s_acctbal < 1000)
        GROUP BY 1, 2, 3""").collect()}
    got = {(r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
           for r in supplier_relation_counts(li, part, supplier).collect()}
    assert got == want and got


def test_degenerate_docs_never_throw(spark):
    """Empty and 1-word documents must flow through the bigram-indexing
    operators without INVALID_ARRAY_INDEX / DIVIDE_BY_ZERO: Spark may
    evaluate a Project's (or CASE branch's) expressions on rows a
    Filter or guard would drop, so every variable-length array
    expression must be TOTAL. Pins the fix for the crash
    test_doc_novelty_matches_model found (and its two siblings in
    corpus_verdicts and the BPE pair transform)."""
    from movement_spark.operators.dataset import corpus_verdicts
    from movement_spark.operators.dedup import doc_novelty_scores
    from movement_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(0, "s0", "en", 1, "w"),              # 1-word: no bigrams
         (1, "s0", "en", 0, ""),               # empty text
         (2, "s0", "en", 200, "x" * 200),      # long single word
         (3, "s1", "en", 200, ("a b " * 50).strip()),  # repetitive
         (4, "s1", "de", 9, "kurz text")],
        "doc_id bigint, source string, lang string, n_chars int, "
        "text string")

    verdicts = {r["doc_id"]: r["verdict"]
                for r in corpus_verdicts(docs).collect()}
    # 1-word/empty docs fall through to the char-length gate; the
    # repetition rule needs >= 2 words, so a long single word keeps.
    assert verdicts == {0: "too_short", 1: "too_short", 2: "keep",
                        3: "repetitive", 4: "bad_lang"}

    novelty = {r["doc_id"]: r["novelty_bps"]
               for r in doc_novelty_scores(docs).collect()}
    assert 0 not in novelty and 1 not in novelty and 2 not in novelty
    assert novelty[3] == 10000 and novelty[4] == 10000

    merges = bpe_train(docs.where(F.col("doc_id").isin(0, 1, 2)),
                       n_merges=2).collect()
    # the corpus has single-char words only after whitespace split of
    # 'w'/''/'xxx…' → 'x x …' symbolization still yields ('x','x')
    assert all(m["n_occ"] >= 1 for m in merges)


def test_ivf_assign_empty_centroid_list_is_empty_not_crash(spark):
    """Totality of the centroid-dim guard: when no vector falls in the
    seed id range (e.g. a delta slice whose ids all exceed it), the
    collected centroid list is EMPTY — cents[0] would be an ANSI
    INVALID_ARRAY_INDEX crash there (the class CLAUDE.md pins);
    get(cents, 0) makes the guard NULL so every row filters out
    instead. Before the seed range existed, the same input merely
    produced no assignments — crash-free must stay true."""
    from movement_spark.operators.similarity import ivf_assign

    emb = spark.createDataFrame(
        [(100 + i, "s", [float(i), 1.0]) for i in range(5)],
        "vec_id bigint, label string, embedding array<float>")
    assert ivf_assign(emb, n_centroids=4).count() == 0


def test_incremental_state_merge_counts_null_doc_id(spark):
    """The base/delta split must be TOTAL: pmod(NULL, mod) is NULL and
    both where() branches would drop a NULL-doc_id row, silently
    shrinking the merged view while a one-pass recompute counts it.
    NULL rides with the base; merge(state(base), state(delta)) must
    equal state(full) including that row."""
    from movement_spark.operators.relational import (
        _doc_agg_state, incremental_state_merge)

    docs = spark.createDataFrame(
        [(0, "s0", "en", 10, "a"), (8, "s0", "en", 20, "b"),
         (None, "s0", "en", 30, "c"), (9, "s1", "de", 40, "d")],
        "doc_id bigint, source string, lang string, n_chars int, "
        "text string")
    merged = {r["source"]: (r["n_docs"], r["sum_chars"])
              for r in incremental_state_merge(docs).collect()}
    full = {r["source"]: (r["n_docs"], r["sum_chars"])
            for r in _doc_agg_state(docs).collect()}
    assert merged == full
    assert merged["s0"] == (3, 60), "NULL doc_id row must be counted"


def test_pq_encode_arrow_excludes_null_element_vectors(spark):
    """A correct-LENGTH vector carrying a NULL element must be excluded
    by the Arrow build, not encoded: NULL becomes NaN on the pandas
    side and the int64 ndarray cast is an unchecked C cast (NaN →
    INT64_MIN), which would write deterministic-looking but meaningless
    codes into the index."""
    from movement_spark.operators.similarity import (
        PQ_M, PQ_SUB, pq_codebook, pq_encode_arrow)

    dim = PQ_M * PQ_SUB
    good = [float(i % 7) for i in range(dim)]
    holed = [None if i == 3 else float(i % 5) for i in range(dim)]
    emb = spark.createDataFrame(
        [(0, "s", good), (1, "s", holed)],
        "vec_id bigint, label string, embedding array<float>")
    cb = pq_codebook(emb.where(F.col("vec_id") == 0))
    got = pq_encode_arrow(emb, cb).collect()
    assert [r["vec_id"] for r in got] == [0], \
        "the NULL-element vector must not be encoded"
    assert all(c is not None for c in got[0]["codes"])


def test_reshard_moves_only_to_new_shards(spark):
    """Rendezvous property: extending 8 shards to 10 leaves every old
    shard's score for a key unchanged, so a key relocates ONLY when a
    NEW shard outscores all old ones — zero old-to-old churn, moved
    share ~ (n_new-n_old)/n_new. This is the guarantee that makes the
    reshard manifest a minimal-movement plan (key % n would churn ~90%)."""
    from movement_spark.operators.chunking import reshard_movement_manifest

    docs = spark.range(20000).withColumnRenamed("id", "doc_id")
    rows = reshard_movement_manifest(docs, "doc_id", 8, 10).collect()
    moved = [r for r in rows if r["moved"] == 1]
    assert moved, "adding shards must relocate some keys"
    assert all(r["new_shard"] >= 8 for r in moved), \
        f"moved keys must land on NEW shards only: {sorted(moved)}"
    total = sum(r["n_docs"] for r in rows)
    frac = sum(r["n_docs"] for r in moved) / total
    assert 0.10 < frac < 0.30, f"moved fraction {frac} far from 2/10"
    # every shard id participates — the hash spreads, nothing starves
    assert {r["old_shard"] for r in rows} == set(range(8))
    assert {r["new_shard"] for r in rows} == set(range(10))


def test_range_layout_plan_balance(spark):
    """The range plan's one-bucket balance bound: every planned shard's
    row count stays within [ideal - max_bucket, ideal + max_bucket]
    where max_bucket is the largest single histogram bucket (whole
    buckets are indivisible), shards tile the value axis contiguously,
    and counts conserve the corpus."""
    from movement_spark.operators.chunking import range_layout_plan

    docs = spark.range(30000).select(
        F.col("id").alias("doc_id"),
        # skewed lengths: quadratic ramp clamped into the 64x16 grid
        ((F.col("id") % 97) * (F.col("id") % 89) % 1000)
        .alias("n_chars"))
    rows = sorted(range_layout_plan(docs, n_shards=8).collect(),
                  key=lambda r: r["shard_id"])
    total = sum(r["n_rows"] for r in rows)
    assert total == 30000
    hist = (docs.groupBy(F.least(F.expr("n_chars div 16"), F.lit(63)))
            .count().agg(F.max("count")).collect()[0][0])
    ideal = total / 8
    for r in rows:
        assert abs(r["n_rows"] - ideal) <= hist, \
            f"shard {r['shard_id']} off-ideal by more than one bucket"
    # contiguous, non-overlapping value coverage
    for a, b in zip(rows, rows[1:]):
        assert a["hi_edge"] == b["lo_edge"], (a, b)
    assert rows[0]["shard_id"] == 0 and len(rows) == 8


def test_lang_buckets_distinct_for_fixture_langs():
    """The mergeable-state lang bitmap is exact only while the observed
    lang domain is collision-free in its 61 buckets — pin that the five
    fixture langs occupy five distinct buckets (n_langs is exact, not a
    lower bound, on this corpus)."""
    from movement_spark.operators.relational import LANG_BUCKETS

    def bucket(lang: str) -> int:
        return (ord(lang[0]) * 7 + ord(lang[1])) % LANG_BUCKETS

    langs = ["de", "en", "es", "fr", "zh"]
    assert len({bucket(lg) for lg in langs}) == len(langs)


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF fusion contract on a corpus engineered so the legs disagree:
    a doc surfaced by only one leg carries a NULL rank for the other
    and its rrf_score is exactly that single leg's SCALE div (K+rank);
    a doc surfaced by both sums both contributions; the fused order is
    (rrf_score DESC, doc_id ASC)."""
    from movement_spark.operators.text import (
        RRF_K, RRF_SCALE, hybrid_rrf_topk)

    rows = [
        # doc 0: lexical hit only (query terms, long doc dilutes dense)
        (0, "dup merge query " + "line " * 200, "en", "s0", 0),
        # doc 1: both legs (query terms, short doc)
        (1, "dup merge query", "en", "s0", 0),
        # doc 2: dense leg only — "column" feature-hashes into the
        #        same bucket as merge/query (qv weight 2) but is not a
        #        BM25 term, so the lexical leg misses it entirely while
        #        its dense score (6*1000/3) tops doc 1's (5*1000/3)
        (2, "column column column", "en", "s0", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r["doc_id"]: r for r in hybrid_rrf_topk(docs, r=2, k=3).collect()}
    # doc 2 has no query term: absent from the lexical leg entirely
    assert got[2]["lex_rank"] is None
    assert got[2]["rrf_score"] == RRF_SCALE // (RRF_K + got[2]["sem_rank"])
    # doc 0's dense score is diluted by 200 off-bucket words: with
    # per-leg depth r=2 it falls off the dense list but keeps its
    # lexical slot — the symmetric single-leg case
    assert got[0]["sem_rank"] is None and got[0]["lex_rank"] is not None
    assert got[0]["rrf_score"] == RRF_SCALE // (RRF_K + got[0]["lex_rank"])
    # doc 1 is in both legs: score is the two-leg sum
    both = got[1]
    assert both["lex_rank"] is not None and both["sem_rank"] is not None
    assert both["rrf_score"] == (RRF_SCALE // (RRF_K + both["lex_rank"])
                                 + RRF_SCALE // (RRF_K + both["sem_rank"]))
    # fused ordering: rank follows (rrf_score DESC, doc_id ASC)
    ordered = sorted(got.values(), key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert [r["rank"] for r in ordered] == [1, 2, 3]


def test_ann_filtered_topk_respects_predicate(spark, sf_dir):
    """Filtered ANN: every returned candidate carries the query's own
    label (the predicate is enforced inside the probed lists), ranks
    are 1..n dense per query, and — the post-filtering contract — each
    query's candidate set is a subset of what the UNfiltered search
    over the same probes would return for that label."""
    from movement_spark.operators.similarity import (
        FILTER_NPROBE, ivf_filtered_topk, ivf_topk)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    got = ivf_filtered_topk(emb, n_queries=5, k=5).collect()
    assert got, "filtered search returned nothing"
    per_q = {}
    for r in got:
        assert r["label"] == labels[r["query_id"]], r
        assert labels[r["vec_id"]] == r["label"], r
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
    # consistency vs the unfiltered search at the same nprobe: the
    # filtered top-k is exactly the label-matching slice re-ranked
    unf = ivf_topk(emb, n_queries=5, k=10**6, nprobe=FILTER_NPROBE).collect()
    want = {}
    for r in sorted(unf, key=lambda r: (r["query_id"], -r["dot"], r["vec_id"])):
        if labels[r["vec_id"]] == labels[r["query_id"]]:
            want.setdefault(r["query_id"], []).append(r["vec_id"])
    for r in got:
        assert want[r["query_id"]][r["rank"] - 1] == r["vec_id"], r


def test_mmr_second_pick_skips_near_duplicate(spark):
    """MMR's reason to exist: when the two most relevant candidates are
    exact duplicates, plain top-2 returns both; MMR's second greedy
    step must skip the duplicate (its max-sim-to-selected penalty
    dwarfs its relevance) and pick the diverse third candidate. Also
    pins the first pick = plain argmax and score = A*rel - B*max_sim."""
    from movement_spark.operators.similarity import (
        MMR_A, MMR_B, mmr_diversified_topk)

    rows = [
        (0, [1.0, 1.0, 0.0, 0.0], 0),    # the query
        (10, [20.0, 0.0, 0.0, 0.0], 0),  # most relevant (rel 20)
        (11, [20.0, 0.0, 0.0, 0.0], 0),  # exact dup of 10 (sim 400)
        (12, [0.0, 18.0, 0.0, 0.0], 0),  # diverse runner-up (rel 18)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["mmr_rank"]: r
           for r in mmr_diversified_topk(emb, n_queries=1, k=2).collect()}
    assert got[1]["vec_id"] == 10
    assert got[1]["score"] == MMR_A * got[1]["rel"]
    assert got[2]["vec_id"] == 12, "MMR kept the near-duplicate"
    # quantized ints: rel(12)=18e6, sim(12,10)=0 -> score = A*rel
    assert got[2]["score"] == MMR_A * got[2]["rel"] - MMR_B * 0


def test_mmr_bulk_equals_unrolled(spark, sf_dir):
    """The production single-expression greedy (mode='bulk', the
    registry default) must be bit-identical to the engine-portable
    unrolled relational form the oracle mirrors — same picks, same
    scores, same ranks — including a k > pool-size query (the if-guard
    stops early instead of appending a NULL struct)."""
    from movement_spark.operators.similarity import mmr_diversified_topk
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(mmr_diversified_topk(emb)) == key(
        mmr_diversified_topk(emb, mode="unrolled"))
    # pool smaller than k: both forms emit exactly pool picks per query
    small = key(mmr_diversified_topk(emb, n_queries=2, pool=2, k=5))
    assert small == key(
        mmr_diversified_topk(emb, n_queries=2, pool=2, k=5,
                             mode="unrolled"))
    assert len(small) == 4


def test_ivf_assign_arrow_matches_jvm(spark, sf_dir):
    """The Arrow flat-column assignment must be row-identical to the
    JVM expression form — same q arrays, same cent_id per vec_id, same
    tie-break (codebook rows sorted by cent_id + np.argmax first-max ==
    orderBy(dot DESC, cent_id ASC) LIMIT 1) — and must EXCLUDE the
    same malformed rows; a malformed CODEBOOK row raises instead of
    silently skewing every assignment."""
    import pytest

    from movement_spark.operators.similarity import (
        ivf_assign, ivf_assign_arrow)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    jvm = {r["vec_id"]: (tuple(r["q"]), r["cent_id"])
           for r in ivf_assign(emb).collect()}
    arrow = {r["vec_id"]: (tuple(r["q"]), r["cent_id"])
             for r in ivf_assign_arrow(emb).collect()}
    assert jvm == arrow and len(jvm) > 0
    # malformed codebook -> explicit error
    bad = spark.createDataFrame(
        [(0, [1.0] * 64, 0), (1, [0.5, 0.5], 1), (2, [2.0] * 64, 0)],
        "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="malformed codebook"):
        ivf_assign_arrow(bad, n_centroids=2)


def test_ivf_recall_audit_full_probe_is_perfect(spark, sf_dir):
    """Recall semantics pin: probing EVERY inverted list makes IVF ==
    the exact scan, so the audit must report 10000 bps for every query;
    at nprobe=1 the audit stays within [0, 10000] with n_hit*2000 ==
    recall_bps (k=5)."""
    from movement_spark.operators.similarity import (
        N_CENTROIDS, ivf_recall_audit)
    from movement_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    full = ivf_recall_audit(emb, nprobe=N_CENTROIDS).collect()
    assert len(full) == 10
    assert all(r["recall_bps"] == 10000 for r in full), full
    one = ivf_recall_audit(emb, nprobe=1).collect()
    for r in one:
        assert 0 <= r["recall_bps"] <= 10000
        assert r["recall_bps"] == r["n_hit"] * 2000, r
