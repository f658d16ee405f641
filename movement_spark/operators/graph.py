"""Iterative graph algorithms over derived graphs (fixed-point loops).

Companion to the label-propagation components in dedup.py: the pattern
for ANY iterative distributed algorithm on Spark is a bounded loop of
join + aggregate rounds with the edge relation persisted once — the
driver holds only scalars, every round is one shuffle keyed by the
destination vertex, and the iteration count is a deployment constant
(not a convergence poll) so the plan is statically known.

PageRank here runs on the token-transition graph (u = token, v = next
token, weight = bigram count — the same derivation as
text.token_bigram_stats) in EXACT integer arithmetic: per-edge
contribution (pr(u) * w) div out_w(u), damping 85/100, teleport base
((15 * SCALE) div 100) div N. Integer division drops sub-ulp mass (and
dangling-vertex mass is deliberately not redistributed) — both choices
are part of the deterministic spec so any engine reproduces the ranks
bit-for-bit; the float/L1-normalized variant is a rendering of these
integers, never the checked value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from movement_spark.operators.text import packed_bigram_expr

PR_SCALE = 1_000_000_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def token_transition_edges(tokens: DataFrame,
                           tok_mod: int = 50261) -> DataFrame:
    """Weighted edge list (u, v, w) of adjacent-token transitions.
    One explode + one map-side-combined count keyed by the packed
    bigram — identical shape to token_bigram_stats' heavy path."""
    bg_expr = packed_bigram_expr(tok_mod)
    return (
        tokens.select(F.explode(F.expr(bg_expr)).alias("bg"))
        .groupBy("bg").agg(F.count("*").alias("w"))
        .select(F.expr(f"cast(bg div {tok_mod} as int)").alias("u"),
                (F.col("bg") % tok_mod).cast("int").alias("v"), "w")
    )


def pagerank_top_tokens(tokens: DataFrame, iters: int = 3,
                        tok_mod: int = 50261, top_n: int = 20) -> DataFrame:
    """Top-N tokens by fixed-iteration integer PageRank.

    Scale shape: the edge relation (with its out-weight) is persisted
    ONCE and re-joined every round; each round is exactly one shuffle on
    the destination vertex plus one co-keyed left join back to the node
    set. The only driver-side values are N (node count) and the derived
    teleport base — control-plane scalars, like the bloom bitmap. At
    100 TB you would also checkpoint the rank relation every few rounds
    to cut lineage depth; with a fixed iters=3 the lineage is bounded
    and Catalyst handles it.
    """
    edges = token_transition_edges(tokens, tok_mod)
    outw = edges.groupBy("u").agg(F.sum("w").alias("out_w"))
    e2 = edges.join(outw, "u").persist()
    nodes = (edges.select(F.col("u").alias("tok"))
             .union(edges.select(F.col("v").alias("tok")))
             .distinct().persist())
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty corpus → empty (typed) rank table, not a ZeroDivisionError
        e2.unpersist()
        nodes.unpersist()
        return tokens.sparkSession.createDataFrame(
            [], schema="tok int, pr_final bigint")
    init = PR_SCALE // n_nodes
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN // n_nodes
    ranks = nodes.withColumn("pr", F.lit(init))
    for _ in range(iters):
        contrib = (
            e2.join(ranks, e2.u == ranks.tok)
            .select(F.col("v").alias("tok"),
                    F.expr("(pr * w) div out_w").alias("c")))
        agg = contrib.groupBy("tok").agg(
            F.sum("c").cast("bigint").alias("sc"))
        ranks = nodes.join(agg, "tok", "left").select(
            "tok",
            (F.lit(base)
             + F.expr(f"({PR_DAMP_NUM} * coalesce(sc, 0L)) "
                      f"div {PR_DAMP_DEN}")).cast("bigint").alias("pr"))
    final = (
        ranks.orderBy(F.desc("pr"), F.asc("tok")).limit(top_n)
        .select(F.col("tok").cast("int").alias("tok"),
                F.col("pr").cast("bigint").alias("pr_final"))
    )
    # materialize the top-N (control-plane small) so the two cached
    # relations can be released — a lazily returned frame would either
    # pin the cache forever in a long-lived registry process or, if
    # unpersisted early, silently recompute all rounds uncached
    rows = final.collect()
    e2.unpersist()
    nodes.unpersist()
    return tokens.sparkSession.createDataFrame(
        rows, schema="tok int, pr_final bigint")
