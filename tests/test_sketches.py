"""Accuracy gates for the at-scale approximate paths.

The oracle-gated queries use EXACT forms (countDistinct, percentile,
KMV with deterministic hash) because hash parity demands bit equality.
At 10^12 rows the production plans swap in approx sketches; these tests
pin each approximation's error against its exact counterpart on the
same data, so the swap is a measured trade, not a leap.
"""

from pyspark.sql import functions as F

from movement_spark.sources.tables import load_table
from movement_spark.sources.tokens import token_sequences


def test_hll_distinct_within_5pct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_within_1pct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("exact"),
        F.expr("percentile_approx(o_totalprice, 0.9, 1000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_kmv_estimate_within_20pct(spark, sf_dir):
    """The oracle-exact KMV sketch (k=64) must also be a sane estimator:
    (k-1)*p/h_k lands within the ~1/sqrt(k) band of the true count."""
    from movement_spark.queries import queries
    est = queries()["kmv_distinct_sketch"](spark, sf_dir).collect()[0]
    truth = (load_table(spark, sf_dir, "orders")
             .agg(F.countDistinct("o_custkey")).collect()[0][0])
    assert abs(est.est_distinct - truth) / truth < 0.20


def test_minhash_bands_find_true_near_dups(spark, sf_dir):
    """Recall sanity for LSH banding: docs sharing a band bucket must
    exist (the synthetic corpus's coarse shingle space guarantees
    near-dups), and every doc lands in exactly MINHASH_BANDS buckets."""
    from movement_spark.operators.dedup import (
        MINHASH_BANDS, minhash_band_buckets)
    t = token_sequences(spark, sf_dir)
    buckets = minhash_band_buckets(t)
    n_docs = t.select("doc_id").distinct().count()
    assert buckets.count() == n_docs * MINHASH_BANDS
    collisions = (buckets.groupBy("band", "bucket")
                  .count().where(F.col("count") > 1).count())
    assert collisions > 0


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min's structural guarantee: est >= exact for every probed
    key (cells only ever ADD counts), and at least one estimate should
    be exact when the grid is sparse relative to the key count."""
    from movement_spark.operators.sketches import cms_heavy_hitters
    rows = cms_heavy_hitters(
        load_table(spark, sf_dir, "orders"), "o_custkey").collect()
    assert rows, "top-k must be non-empty"
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_est >= r.exact_cnt for r in rows)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Bloom membership is one-sided: every true build-side match must
    pass the filter; pruning power = rows rejected before the join."""
    from movement_spark.operators.sketches import bloom_prune_stats
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    row = bloom_prune_stats(load_table(spark, sf_dir, "orders"),
                            "o_custkey", cust, "c_custkey").collect()[0]
    assert row.n_false_neg == 0
    assert row.n_passed >= row.n_true
    assert row.n_passed <= row.n_probe


def test_loglog_grid_is_bounded_and_sane(spark, sf_dir):
    """The register grid never exceeds LL_M registers regardless of key
    count, and bit lengths stay inside the 31-bit hash domain."""
    from movement_spark.operators.sketches import (
        LL_M, loglog_register_profile)
    row = loglog_register_profile(
        load_table(spark, sf_dir, "orders"), "o_custkey").collect()[0]
    assert 0 < row.registers_used <= LL_M
    assert row.max_bitlen <= 31
    assert row.sum_max_bitlen <= row.registers_used * 31
    assert row.sketch_estimate > 0


def test_segment_dedup_rates_are_permille(spark, sf_dir):
    from movement_spark.operators.dedup import segment_dedup_stats
    rows = segment_dedup_stats(
        load_table(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_permille <= 1000
        assert r.n_distinct_segs <= r.n_segs
        assert r.n_dup_occ <= r.n_segs


def test_scrub_audit_shrinks_payload(spark, sf_dir):
    from movement_spark.operators.text import scrub_audit
    rows = scrub_audit(load_table(spark, sf_dir, "events")).collect()
    assert rows
    for r in rows:
        assert r.n_flagged <= r.n_records
        assert r.total_runs >= r.n_flagged
        assert r.bytes_redacted <= r.bytes_raw


def test_kmeans_assignment_partitions_corpus(spark, sf_dir):
    from movement_spark.operators.similarity import kmeans_centroids
    rows = kmeans_centroids(
        load_table(spark, sf_dir, "embeddings")).collect()
    clusters = {r.cluster: r.n_assigned for r in rows}
    assert len(clusters) <= 4
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(clusters.values()) == n_vecs
    dims_per_cluster = {}
    for r in rows:
        dims_per_cluster.setdefault(r.cluster, set()).add(r.dim)
    assert all(len(d) == 64 for d in dims_per_cluster.values())


def test_kmv_set_algebra_exact_on_small_sets(spark):
    """Below k, every estimate must be the exact cardinality: users
    1..10 click, 5..12 purchase -> |A|=10, |B|=8, |A∪B|=12, |A∩B|=6."""
    from movement_spark.operators.sketches import kmv_set_algebra

    rows = [(i, "click", u) for i, u in enumerate(range(1, 11))]
    rows += [(100 + i, "purchase", u) for i, u in enumerate(range(5, 13))]
    ev = spark.createDataFrame(
        [(eid, t, u) for eid, t, u in rows],
        "event_id BIGINT, event_type STRING, user_id BIGINT")
    r = kmv_set_algebra(ev).collect()[0]
    assert (r.est_a, r.est_b, r.est_union, r.k_merged, r.k_both,
            r.est_intersect) == (10, 8, 12, 12, 6, 6)


def test_quantile_sketch_brackets_exact_percentile(spark):
    """The sketch's deterministic error contract: for every source and
    every p, the exact percentile lies in [p_lo, p_lo + QSK_WIDTH) —
    the bucket that crossed ceil(p*n/100) really contains the p-th
    value (values stay under the clamp on this corpus)."""
    from pyspark.sql import functions as F

    from movement_spark.operators.sketches import (
        QSK_WIDTH, histogram_quantile_profile)

    import math
    from collections import defaultdict

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {r["source"]: r
           for r in histogram_quantile_profile(docs).collect()}
    vals = defaultdict(list)
    for r in docs.select("source", "n_chars").collect():
        vals[r["source"]].append(r["n_chars"])
    assert set(got) == set(vals) and got
    for src, row in got.items():
        ordered = sorted(vals[src])
        for p in (50, 90, 99):
            lo = row[f"p{p}_lo"]
            # the sketch targets the ceil(p*n/100)-th ORDER STATISTIC
            # (the discrete quantile a counter grid can bracket), not
            # SQL's interpolated percentile
            kth = ordered[math.ceil(p * len(ordered) / 100) - 1]
            assert lo <= kth < lo + QSK_WIDTH, (src, p, lo, kth)
