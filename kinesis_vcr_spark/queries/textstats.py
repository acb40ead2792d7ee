"""Text-analysis queries over ``documents`` — the oracle-checkable
surface of :mod:`kinesis_vcr_spark.functions.text`.

Every output value is either integer (token counts, hashes) or a 6-dp
rounded ratio of exact integer arithmetic, so DuckDB reproduces it
bit-for-bit; SQL mirrors the Catalyst expressions fold-for-fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.functions.text import (
    BPE_PATTERN,
    STOPWORDS,
    bpe_token_count,
    char_5gram_hashes,
    fingerprint,
    lang_hits,
    mean_token_len,
    predicted_lang,
    quality_score,
    token_count,
    whitespace_tokens,
)
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

# ---------------------------------------------------------------------------
# per-document token statistics
# ---------------------------------------------------------------------------


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count(text).alias("n_tokens"),
        bpe_token_count(text).alias("n_bpe_tokens"),
        F.size(F.array_distinct(whitespace_tokens(text))).alias("n_distinct"),
        F.round(mean_token_len(text), 6).alias("mean_token_len"),
    ).orderBy("doc_id")


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       round(CAST(list_reduce(list_transform(string_split(text, ' '),
                 x -> length(x)), (a, b) -> a + b) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS mean_token_len
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language prediction, aggregated as a confusion
    table (labeled lang x predicted lang)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return (
        docs.select(
            "lang",
            predicted_lang(text).alias("predicted"),
            lang_hits(text, "en").alias("en_hits"),
        )
        .groupBy("lang", "predicted")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("en_hits").alias("total_en_hits"),
        )
        .orderBy("lang", "predicted")
    )


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(string_split(text, ' ')), [{words}]))"
    )


LANGID_SQL = f"""
WITH scored AS (
  SELECT lang,
         {_hits_sql('de')} AS h_de, {_hits_sql('en')} AS h_en,
         {_hits_sql('es')} AS h_es, {_hits_sql('fr')} AS h_fr,
         {_hits_sql('zh')} AS h_zh
  FROM documents
), pred AS (
  SELECT lang, h_en,
         CASE WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
              WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
              WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
              WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
              ELSE 'zh' END AS predicted
  FROM scored
)
SELECT lang, predicted, count(*) AS n_docs,
       CAST(sum(h_en) AS BIGINT) AS total_en_hits
FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

QUALITY_THRESHOLD = 0.6


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality profile: doc counts above/below threshold +
    order-independent min/max of the (deterministically rounded) score."""
    docs = load_table(spark, sf_dir, "documents")
    score = quality_score(F.col("text"))
    return (
        docs.select("source", score.alias("q"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("q") < QUALITY_THRESHOLD).cast("long")).alias("n_low"),
            F.min("q").alias("min_score"),
            F.max("q").alias("max_score"),
        )
        .orderBy("source")
    )


_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

QUALITY_SQL = f"""
WITH q AS (
  SELECT source,
         round((least(len(string_split(text, ' ')) / 100.0, 1.0)
            + CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains([{_EN}], x))) AS DOUBLE)
              / len(string_split(text, ' '))
            + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' '))
            + CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
              / length(text)
           ) / 4.0, 6) AS q
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN q < {QUALITY_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       min(q) AS min_score, max(q) AS max_score
FROM q GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash)
# ---------------------------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint per doc: min 31-polynomial rolling
    hash over distinct char 5-grams (+ the distinct-gram count).
    Integer arithmetic mod 2^31 → engine-exact."""
    from kinesis_vcr_spark.functions.text import fingerprint_features

    docs = load_table(spark, sf_dir, "documents")
    # CPU-bound per-row hashing: spread a coarse (single-file) scan
    # across cores before the UDF — at cluster scale the input split
    # count already provides this and AQE would elide the exchange
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    feats = docs.select(
        "doc_id", fingerprint_features()(F.col("text")).alias("s")
    )
    return feats.select(
        "doc_id",
        F.col("s.fp").alias("fp"),
        F.col("s.n_grams").alias("n_grams"),
    ).orderBy("doc_id")


FINGERPRINT_SQL = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(length(text) - 4, 1) + 1),
             i -> substring(text, i, 5))) AS g
  FROM documents
)
SELECT doc_id,
       list_min(list_transform(g,
           s -> list_reduce(list_transform(range(1, length(s) + 1),
                    i -> CAST(ord(substring(s, i, 1)) AS BIGINT)),
                (acc, c) -> (acc * 31 + c) % 2147483648))) AS fp,
       len(g) AS n_grams
FROM grams ORDER BY doc_id
"""


register(QuerySpec("text_token_stats", text_token_stats, TOKEN_STATS_SQL,
                   "whitespace + BPE-regex token counting per document"))
register(QuerySpec("text_langid", text_langid, LANGID_SQL,
                   "stopword-profile language ID (confusion table)"))
register(QuerySpec("text_quality", text_quality, QUALITY_SQL,
                   "heuristic quality scoring per source"))
register(QuerySpec("text_fingerprint", text_fingerprint, FINGERPRINT_SQL,
                   "rolling-hash document fingerprint"))
