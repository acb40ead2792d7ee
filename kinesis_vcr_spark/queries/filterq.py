"""Corpus filtering queries — blocklist hygiene + LM perplexity scoring
(operators/blockfilter.py, operators/lmscore.py).

Overflow-positioned by design: the driver's 50-query window is fully
allocated to one representative per family; these register after the
TPC-H variants and are held green by the strict local harness
(tools/oracle_check.py) instead of a driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.blockfilter import flag_blocked
from kinesis_vcr_spark.operators.lmscore import MICRO, score_documents_lm
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

# ---------------------------------------------------------------------------
# C4-style blocklist filter (inject-then-flag: the fixture is clean)
# ---------------------------------------------------------------------------

BAD_TERMS = ("spamword", "otherbad")
BAD_DOMAINS = ("bad.example.com", "evil.test")
TERM_MOD = 5
URL_MOD = 7


def _injected_docs(docs: DataFrame) -> DataFrame:
    """Plant one denylisted token in every 5th doc and one denylisted
    URL (mixed-case host, exercising normalization) in every 7th —
    deterministic from doc_id, so the oracle replants identically and
    the verdict counts are non-vacuous."""
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(TERM_MOD)) == 0, F.lit(" spamword")
            ).otherwise(F.lit("")),
            F.when(
                F.pmod("doc_id", F.lit(URL_MOD)) == 0,
                F.lit(" see https://Bad.Example.com/page"),
            ).otherwise(F.lit("")),
        ).alias("txt"),
    )


def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source blocklist verdict counts over the injected corpus:
    whole-token bad-word hits + denylisted URL-domain hits (C4 §2.2 /
    RefinedWeb URL filtering shapes)."""
    docs = _injected_docs(load_table(spark, sf_dir, "documents"))
    verdict = flag_blocked(
        docs, spark, "doc_id", "txt",
        bad_terms=BAD_TERMS, bad_domains=BAD_DOMAINS,
    )
    return (
        docs.select("doc_id", "source")
        .join(verdict, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("blocked").cast("long")).alias("n_blocked"),
            F.sum("term_hits").alias("term_hits"),
            F.sum("domain_hits").alias("domain_hits"),
        )
        .orderBy("source")
    )


_TERMS_IN = ", ".join(f"'{t}'" for t in BAD_TERMS)
_DOMAINS_IN = ", ".join(f"'{d}'" for d in BAD_DOMAINS)

BLOCKLIST_SQL = rf"""
WITH injected AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % {TERM_MOD} = 0 THEN ' spamword' ELSE '' END
         || CASE WHEN doc_id % {URL_MOD} = 0
                 THEN ' see https://Bad.Example.com/page' ELSE '' END AS txt
  FROM documents
), th AS (
  SELECT doc_id, count(*) AS term_hits FROM (
    SELECT doc_id, unnest(string_split(txt, ' ')) AS token FROM injected
  ) WHERE token IN ({_TERMS_IN}) GROUP BY doc_id
), dh AS (
  SELECT doc_id, count(*) AS domain_hits FROM (
    SELECT doc_id,
           lower(regexp_extract(url, '^https?://([^/:\s]+)', 1)) AS domain
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(txt, 'https?://[^\s]+')) AS url
      FROM injected
    )
  ) WHERE domain IN ({_DOMAINS_IN}) GROUP BY doc_id
)
SELECT i.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(th.term_hits, 0) > 0
                       OR coalesce(dh.domain_hits, 0) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(sum(coalesce(th.term_hits, 0)) AS BIGINT) AS term_hits,
       CAST(sum(coalesce(dh.domain_hits, 0)) AS BIGINT) AS domain_hits
FROM injected i
LEFT JOIN th USING (doc_id)
LEFT JOIN dh USING (doc_id)
GROUP BY i.source ORDER BY i.source
"""


register(QuerySpec("text_blocklist_filter", text_blocklist_filter,
                   BLOCKLIST_SQL,
                   "C4 blocklist hygiene: bad-word token + URL-domain "
                   "denylist verdicts (injected, non-vacuous)"))


# ---------------------------------------------------------------------------
# unigram-LM perplexity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LM-score profile: corpus-self-trained add-1 unigram
    NLL per token, exact integer micro-nat totals; mean from exact
    sums, min/max over per-doc ratios (order-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents_lm(docs, "doc_id", "text")
    per_doc_nll = F.col("nll_micro_total") / (
        F.col("n_tokens") * F.lit(float(MICRO))
    )
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("nll_micro_total")
                / (F.sum("n_tokens") * F.lit(float(MICRO))),
                6,
            ).alias("avg_nll"),
            F.round(F.min(per_doc_nll), 6).alias("min_doc_nll"),
            F.round(F.max(per_doc_nll), 6).alias("max_doc_nll"),
        )
        .orderBy("source")
    )


LM_SCORE_SQL = f"""
WITH tk AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE length(token) > 0
), counts AS (
  SELECT token, count(*) AS c FROM tk GROUP BY token
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v_size FROM counts
), nll AS (
  SELECT token,
         CAST(round(ln((n_total + 1.0 * v_size) / (c + 1.0)) * {MICRO})
              AS BIGINT) AS nll_micro
  FROM counts, tot
), doc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(nll_micro) AS BIGINT) AS nll_total
  FROM tk t JOIN nll USING (token) GROUP BY t.doc_id
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(d.nll_total) AS BIGINT)
             / (CAST(sum(d.n_tokens) AS BIGINT) * {MICRO}.0), 6) AS avg_nll,
       round(min(d.nll_total / (d.n_tokens * {MICRO}.0)), 6) AS min_doc_nll,
       round(max(d.nll_total / (d.n_tokens * {MICRO}.0)), 6) AS max_doc_nll
FROM doc d JOIN (SELECT doc_id, source FROM documents) s USING (doc_id)
GROUP BY s.source ORDER BY s.source
"""


register(QuerySpec("lm_unigram_score", lm_unigram_score, LM_SCORE_SQL,
                   "CCNet-style unigram-LM scoring: exact micro-nat NLL "
                   "totals, per-source perplexity profile"))
