"""Text analysis operators over the documents table.

Language-ID, quality scoring, token counting, fingerprinting — all as
built-in column expressions (JVM-side, codegen'd); nothing here drops to
Python. Heuristics are intentionally simple/deterministic so the DuckDB
oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to")
FP_LEN = 64          # chars fingerprinted
FP_MOD = 1_000_000_007


def tokenize_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token counting per source (generated text is
    single-space separated; a BPE-ish regex split is in quality_scores)."""
    words = documents.select(
        "source",
        F.size(F.split("text", " ")).alias("n_words"),
        F.length("text").alias("n_chars_m"),
    )
    return (
        words.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_words").cast("bigint").alias("sum_words"),
             F.sum("n_chars_m").cast("bigint").alias("sum_chars"),
             F.max("n_words").alias("max_words"))
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-doc quality features → per-source integer-valued aggregates.

    Features: word count, mean word length (x1000 fixed point), stopword
    hits. Quality rank = coarse bucket of words-per-doc.
    """
    feats = documents.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).alias("n_words"),
        F.length("text").alias("len"),
        sum((F.size(F.split(F.col("text"), f" {w} ")) - 1) for w in STOPWORDS)
        .alias("stop_hits"),
    ).withColumn(
        # floor() in both engines (cast double->bigint truncates in Spark
        # but ROUNDS in DuckDB — never rely on cast for this)
        "mean_word_len_x1000",
        F.floor((F.col("len") - F.col("n_words") + 1) * 1000 / F.col("n_words")),
    ).withColumn(
        "quality_bucket",
        F.least(F.floor(F.col("n_words") / 20), F.lit(4)).cast("int"))
    return (
        feats.groupBy("source", "quality_bucket")
        .agg(F.count("*").alias("n_docs"),
             F.sum("stop_hits").cast("bigint").alias("sum_stop_hits"),
             F.sum("mean_word_len_x1000").cast("bigint").alias("sum_mwl"))
    )


def langid_heuristic(documents: DataFrame) -> DataFrame:
    """N-gram language heuristic: per-doc stopword-density score compared
    across 'languages' = per-source densities. Returns per (lang, source)
    score sums so the labeled lang column can be evaluated against the
    heuristic. Integer outputs only."""
    scored = documents.select(
        "lang", "source",
        (F.size(F.split(F.col("text"), " the ")) - 1).alias("en_hits"),
        (F.size(F.split(F.col("text"), " data ")) - 1).alias("tech_hits"),
        F.length("text").alias("len"),
    ).withColumn(
        "en_density_x1000",
        F.floor(F.col("en_hits") * 1000 / F.greatest(F.col("len"), F.lit(1))))
    return (
        scored.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("en_hits").cast("bigint").alias("sum_en_hits"),
             F.sum("tech_hits").cast("bigint").alias("sum_tech_hits"),
             F.sum("en_density_x1000").cast("bigint").alias("sum_en_density"))
    )


def doc_fingerprints(documents: DataFrame, sample_mod: int = 25) -> DataFrame:
    """Rolling polynomial fingerprint of the first FP_LEN chars:
    h = fold(h*31 + ascii(c)) mod FP_MOD. Order-sensitive content digest
    (the text analog of merged_doc_check's poly hash)."""
    sampled = documents.where(F.col("doc_id") % sample_mod == 0)
    fp = (
        f"aggregate(sequence(1, cast(least(n_chars, {FP_LEN}) as int)), 0L, "
        f"(acc, i) -> (acc * 31 + ascii(substring(text, cast(i as int), 1))) % {FP_MOD})"
    )
    return sampled.select(
        "doc_id", "lang", "source",
        F.expr(fp).alias("fingerprint"),
        F.least(F.col("n_chars"), F.lit(FP_LEN)).cast("int").alias("fp_len"),
    )
