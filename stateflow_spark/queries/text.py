"""Text-analysis queries over the `documents` table — the training-data
pipeline surface: token counting, quality scoring, language-ID heuristic,
document fingerprinting. All expressions stay JVM-side (built-in functions +
higher-order lambdas), no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register

STOPWORDS = ("the", "a", "of", "and", "to")
STOP_SQL = "('the', 'a', 'of', 'and', 'to')"


def _tokens():
    return F.split(F.col("text"), " ")


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(len(string_split(text, ' '))) AS total_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting aggregated per language label."""
    d = load(spark, sf_dir, "documents")
    ntok = F.size(_tokens())
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        (F.sum(ntok).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_tokens"
        ),
        F.max(ntok).alias("max_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN {STOP_SQL})) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
           (len(string_split(text, ' ')) BETWEEN 20 AND 2000
            AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.25)
               AS quality_ok
    FROM documents
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, type/token ratio, stopword
    ratio, and a boolean quality gate (the C4/Gopher-style length+repetition
    filters, minus punctuation rules the synthetic corpus can't exercise)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    ntok = F.size(toks)
    ndis = F.size(F.array_distinct(toks))
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    nstop = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({stop_list}))"))
    distinct_ratio = ndis.cast("double") / ntok.cast("double")
    stopword_ratio = nstop.cast("double") / ntok.cast("double")
    return d.select(
        "doc_id",
        ntok.alias("n_tokens"),
        ndis.alias("n_distinct"),
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        (ntok.between(20, 2000) & (distinct_ratio > 0.25)).alias("quality_ok"),
    )


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t = 'the' OR t = 'a')) * 10
                     >= len(string_split(text, ' ')) THEN 'en'
                ELSE 'other' END AS pred_lang,
           (lang = CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t = 'the' OR t = 'a')) * 10
                     >= len(string_split(text, ' ')) THEN 'en'
                ELSE 'other' END) AS agrees
    FROM documents
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-marker token frequency ≥ 10% → 'en'.
    (A real n-gram profile model slots in here; the synthetic corpus shares
    one vocabulary so only the deterministic rule is checkable.)"""
    d = load(spark, sf_dir, "documents")
    nmark = F.size(F.expr("filter(split(text, ' '), t -> t = 'the' OR t = 'a')"))
    ntok = F.size(_tokens())
    pred = F.when(nmark * 10 >= ntok, F.lit("en")).otherwise(F.lit("other"))
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (F.col("lang") == pred).alias("agrees"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp,
           md5(concat(lang, ':', text)) AS fp_keyed,
           substr(md5(text), 1, 8) AS fp_short
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints (md5 full + truncated + key-salted) — the exact
    building block of exact-dedup and shard-stable document ids."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("text"))).alias("fp_keyed"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("fp_short"),
    )


@register(
    "text_length_histogram",
    oracle="""
    SELECT (len(string_split(text, ' ')) // 10) * 10 AS token_bucket,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "histogram"),
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram in buckets of 10 (corpus shape profiling)."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.floor(F.size(_tokens()) / 10) * 10).cast("bigint")
    return d.groupBy(bucket.alias("token_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
