"""Training-data preparation queries — deterministic sampling, splits,
benchmark decontamination, PII redaction.

The driver-checkable surface of :mod:`operators.sampling`,
:mod:`operators.decontam` and the PII functions in :mod:`functions.text`.
Every sampling decision is an md5-hex ticket (identical lowercase hex in
Spark and DuckDB, compared lexicographically at fixed width), so the
oracle reproduces membership bit-for-bit — no RNG, no partition
dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.functions.text import PII_PATTERNS, pii_count, redact_pii
from kinesis_vcr_spark.operators.decontam import ngram_contamination
from kinesis_vcr_spark.operators.sampling import (
    hash_bernoulli,
    stratified_topk_by_hash,
    ticket_threshold,
    train_val_test_split,
)
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table, widen_small_scan

_SEP_SQL = "chr(31)"


def _ticket_sql(seed: str, key: str) -> str:
    return f"substr(md5(concat_ws({_SEP_SQL}, '{seed}', CAST({key} AS VARCHAR))), 1, 8)"


# ---------------------------------------------------------------------------
# hash-Bernoulli sampling
# ---------------------------------------------------------------------------

SAMPLE_FRACTION = 0.2
SAMPLE_SEED = "r3"


def sample_bernoulli_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% document sample — stable under repartitioning
    and engine-portable (zero shuffles; the filter rides the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_bernoulli(docs, ["doc_id"], SAMPLE_FRACTION, seed=SAMPLE_SEED)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


BERNOULLI_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_ticket_sql(SAMPLE_SEED, "doc_id")} < '{ticket_threshold(SAMPLE_FRACTION)}'
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# stratified reservoir (top-k by hash ticket per stratum)
# ---------------------------------------------------------------------------

STRAT_K = 10
STRAT_SEED = "strat"


def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 docs per language, chosen by smallest hash ticket.
    Runs the two-phase (salted) exact top-k — the skew-safe plan a hot
    stratum needs at 100 TB — and must equal the oracle's plain
    row_number, proving the two-phase refinement exact."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_topk_by_hash(
            docs, ["lang"], STRAT_K, ["doc_id"], seed=STRAT_SEED, salt_factor=4
        )
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


STRATIFIED_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, {_ticket_sql(STRAT_SEED, "doc_id")} AS tk FROM documents
), r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY tk, doc_id) AS rk
  FROM t
)
SELECT lang, doc_id FROM r WHERE rk <= {STRAT_K} ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# train/val/test split
# ---------------------------------------------------------------------------

SPLIT_SEED = "split"
_W_TRAIN, _W_VAL = 0.8, 0.1  # test absorbs the remainder


def sample_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of events keyed by event_id —
    per-split row/user counts and exact-decimal value totals. The split
    column is a narrow CASE over the hash ticket (zero extra shuffles;
    the groupBy here is just the audit)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = train_val_test_split(
        ev, ["event_id"], {"train": _W_TRAIN, "val": _W_VAL, "test": 0.1},
        seed=SPLIT_SEED,
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("split")
    )


SPLIT_SQL = f"""
WITH tagged AS (
  SELECT *,
         CASE WHEN {_ticket_sql(SPLIT_SEED, "event_id")}
                   < '{ticket_threshold(_W_TRAIN)}' THEN 'train'
              WHEN {_ticket_sql(SPLIT_SEED, "event_id")}
                   < '{ticket_threshold(_W_TRAIN + _W_VAL)}' THEN 'val'
              ELSE 'test' END AS split
  FROM events
)
SELECT split,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
FROM tagged GROUP BY split ORDER BY split
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

DECONTAM_N = 5  # word n-gram size
_BENCH_MOD = 97  # every 97th doc plays the "benchmark eval set"


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination report of the corpus against a benchmark set
    (docs with doc_id % 97 == 0 stand in for the eval set): per-doc
    distinct 5-gram count, how many also occur in the benchmark, and
    the contamination flag. Benchmark docs themselves read 100% —
    self-detection is the sanity row."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % _BENCH_MOD == 0)
    report = ngram_contamination(
        docs, bench, "doc_id", "text", n=DECONTAM_N, min_hits=1
    )
    return report.select(
        "doc_id",
        "n_grams",
        "n_hits",
        "hit_frac",
        F.col("contaminated").cast("int").alias("contaminated"),
    ).orderBy("doc_id")


DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         -- list_slice clamps at the array end; docs with < {DECONTAM_N} tokens
         -- yield one whole-text gram, mirroring word_shingles_from_tokens
         list_distinct(list_transform(
             range(1, greatest(len(t) - {DECONTAM_N - 1}, 1) + 1),
             i -> array_to_string(list_slice(t, i, i + {DECONTAM_N - 1}), ' ')))
           AS grams
  FROM toks
), bg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM sh WHERE doc_id % {_BENCH_MOD} = 0
), dg AS (
  SELECT doc_id, unnest(grams) AS gram FROM sh
), hits AS (
  SELECT d.doc_id,
         count(*) AS n_grams,
         CAST(coalesce(sum(CASE WHEN b.gram IS NOT NULL THEN 1 END), 0)
              AS BIGINT) AS n_hits
  FROM dg d LEFT JOIN bg b USING (gram)
  GROUP BY d.doc_id
)
SELECT doc_id, n_grams, n_hits,
       round(CAST(n_hits AS DOUBLE) / n_grams, 6) AS hit_frac,
       CASE WHEN n_hits >= 1 THEN 1 ELSE 0 END AS contaminated
FROM hits ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction (inject-then-scrub round trip)
# ---------------------------------------------------------------------------


def _injected_text() -> F.Column:
    """The fixture corpus is PII-free, so plant one email + phone + IPv4
    per doc (derived from doc_id — deterministic) and let the scrubber
    find them; a vacuous all-zeros row would prove nothing."""
    sid = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact u"), sid, F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0.0."), F.pmod(F.col("doc_id"), 250).cast("string"),
    )


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three regex families over injected full text — widen the
    # single-split fixture scan (A/B: 0.8 s -> 0.4 s at sf0.1)
    docs = widen_small_scan(load_table(spark, sf_dir, "documents"))
    injected = docs.select("doc_id", "lang", _injected_text().alias("txt"))
    counted = injected.select(
        "lang",
        pii_count(F.col("txt"), "email").alias("e"),
        pii_count(F.col("txt"), "phone").alias("p"),
        pii_count(F.col("txt"), "ipv4").alias("i"),
        F.length(redact_pii(F.col("txt"))).alias("clean_len"),
    )
    return (
        counted.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            F.sum("i").alias("n_ipv4"),
            F.sum("clean_len").alias("total_clean_chars"),
        )
        .orderBy("lang")
    )


_EMAIL, _PHONE, _IPV4 = (
    PII_PATTERNS["email"], PII_PATTERNS["phone"], PII_PATTERNS["ipv4"],
)

PII_SQL = f"""
WITH injected AS (
  SELECT lang,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) AS txt
  FROM documents
), counted AS (
  SELECT lang,
         len(regexp_extract_all(txt, '{_EMAIL}')) AS e,
         len(regexp_extract_all(txt, '{_PHONE}')) AS p,
         len(regexp_extract_all(txt, '{_IPV4}')) AS i,
         length(regexp_replace(regexp_replace(regexp_replace(txt,
             '{_EMAIL}', '<EMAIL>', 'g'),
             '{_PHONE}', '<PHONE>', 'g'),
             '{_IPV4}', '<IPV4>', 'g')) AS clean_len
  FROM injected
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(i) AS BIGINT) AS n_ipv4,
       CAST(sum(clean_len) AS BIGINT) AS total_clean_chars
FROM counted GROUP BY lang ORDER BY lang
"""


register(QuerySpec(
    "sample_bernoulli_docs", sample_bernoulli_docs, BERNOULLI_SQL,
    "deterministic hash-Bernoulli 20% document sample",
))
register(QuerySpec(
    "sample_stratified_docs", sample_stratified_docs, STRATIFIED_SQL,
    "two-phase exact stratified top-k-by-hash (10 docs per lang)",
))
register(QuerySpec(
    "sample_split_counts", sample_split_counts, SPLIT_SQL,
    "deterministic 80/10/10 train/val/test split audit over events",
))
register(QuerySpec(
    "decontam_ngram_overlap", decontam_ngram_overlap, DECONTAM_SQL,
    "benchmark decontamination: word-5-gram overlap vs planted eval set",
))
register(QuerySpec(
    "text_pii_redaction", text_pii_redaction, PII_SQL,
    "PII inject-then-scrub round trip: email/phone/IPv4 counts + redacted text",
))


# ---------------------------------------------------------------------------
# E92: cross-split near-dup leakage audit
# ---------------------------------------------------------------------------

LEAK_SEED = "leak"
_LEAK_J = 0.6  # fixture is bimodal (planted twins J>=0.96, noise <0.3)


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit (E92): deterministic 80/10/10 split of
    the documents table, banded near-dup pairs at J >= 0.6, one row per
    split combination with pair + distinct-doc counts. Cross-split
    rows are leakage the n-gram decontam pass cannot see (the twin
    differs by tokens); same-split rows are residual in-split dup
    mass. The bimodal fixture makes banding exact (same argument as
    ``dedup_near_minhash``), so the brute-force oracle agrees."""
    from kinesis_vcr_spark.operators.leakage import (  # noqa: PLC0415
        split_leakage_report,
    )

    # NOT persisted (r13, measured): the report reads this from ~18
    # plan branches, but each is codegen ticket/shingle arithmetic
    # over a pruned scan — persisting measured 3.46 -> 7.5 s med at
    # sf0.1 (InMemoryRelation barrier > re-scan). See BASELINE r13.
    docs = train_val_test_split(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        ["doc_id"],
        seed=LEAK_SEED,
    )
    return (
        split_leakage_report(
            docs, "doc_id", "text", threshold=_LEAK_J,
            shingle_size=3, num_hashes=64, bands=16,
        )
        .orderBy("split_a", "split_b")
    )


LEAKAGE_SQL = f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN {_ticket_sql(LEAK_SEED, "doc_id")}
                   < '{ticket_threshold(0.8)}' THEN 'train'
              WHEN {_ticket_sql(LEAK_SEED, "doc_id")}
                   < '{ticket_threshold(0.9)}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingles
  FROM toks
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= {_LEAK_J}
), cl AS (
  SELECT least(ta.split, tb.split) AS split_a,
         greatest(ta.split, tb.split) AS split_b,
         id_a, id_b
  FROM p
  JOIN tagged ta ON ta.doc_id = p.id_a
  JOIN tagged tb ON tb.doc_id = p.id_b
), u AS (
  SELECT split_a, split_b, id_a AS doc FROM cl
  UNION ALL
  SELECT split_a, split_b, id_b AS doc FROM cl
)
SELECT cl.split_a, cl.split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       (SELECT CAST(count(DISTINCT doc) AS BIGINT) FROM u
        WHERE u.split_a = cl.split_a AND u.split_b = cl.split_b) AS n_docs
FROM cl
GROUP BY cl.split_a, cl.split_b
ORDER BY cl.split_a, cl.split_b
"""


register(QuerySpec("split_leakage_audit", split_leakage_audit,
                   LEAKAGE_SQL,
                   "cross-split near-dup leakage audit: deterministic "
                   "80/10/10 hash split x banded near-dup pairs, "
                   "classified per split combination"))
