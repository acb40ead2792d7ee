"""Distribution-profile queries — exact per-group percentiles.

Overflow-positioned (after filterq): the driver's 50-slot window is
fully allocated; these are held green by the strict local harness and
are rotation candidates for a future round (queries._WINDOW_PROMOTE).

Parity notes: Spark's ``percentile`` and DuckDB's ``quantile_cont``
both implement PERCENTILE_CONT — linear interpolation at rank
``p·(n-1)`` over the sorted non-null values. Outputs are rounded to
6 dp on both sides (the interpolation arithmetic is the same formula
on the same doubles; rounding absorbs any last-bit divergence).

Scale posture: exact percentile aggregates a value→count map per
group — memory ∝ distinct values per group, fine for bounded-domain
columns but NOT the 100 TB plan for continuous doubles. At scale swap
``approx_percentile`` (mergeable sketch, map-side partials) or the
sketch-boundary machinery in operators/quantiles.py; this query is
the oracle-checkable exact variant of that family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

PCTS = (0.25, 0.5, 0.75, 0.95, 0.99)


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution profile of ``value``: non-null
    count, min/max, and exact continuous percentiles (p25…p99)."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.percentile("value", F.array(*[F.lit(p) for p in PCTS])).alias(
            "__ps"
        ),
    )
    return agged.select(
        "event_type",
        "n_values",
        "min_value",
        "max_value",
        *[
            F.round(F.element_at("__ps", i + 1), 6).alias(
                f"p{int(p * 100)}"
            )
            for i, p in enumerate(PCTS)
        ],
    ).orderBy("event_type")


PCT_SQL = f"""
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       {", ".join(
           f"round(quantile_cont(value, {p}), 6) AS p{int(p * 100)}"
           for p in PCTS
       )}
FROM events GROUP BY event_type ORDER BY event_type
"""


register(QuerySpec("event_value_percentiles", event_value_percentiles,
                   PCT_SQL,
                   "per-group exact PERCENTILE_CONT profile (p25-p99 + "
                   "min/max) over event values"))


# ---------------------------------------------------------------------------
# deterministic fixed-size per-group sample (eval-set carving)
# ---------------------------------------------------------------------------

SAMPLE_K = 20
SAMPLE_SEED_K = "r6k"


def sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ``min(K, group size)`` documents per source, chosen by
    md5-ticket rank — the fixed-size companion of the hash-Bernoulli
    family (llmprep): deterministic, layout/retry-stable, and the
    sample NESTS (the K=10 sample is a prefix of the K=20 sample, so a
    grown eval set never churns existing members). Runs on the
    skew-safe two-phase top-k (operators/topk.py): a hot source is
    salted across tasks in phase 1, so no task ever sorts more than
    ~1/salt of a group."""
    from kinesis_vcr_spark.operators.sampling import sample_ticket
    from kinesis_vcr_spark.operators.topk import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    with_ticket = docs.select(
        "source", "doc_id",
        sample_ticket("doc_id", seed=SAMPLE_SEED_K).alias("__t"),
    )
    picked = topk_per_group(
        with_ticket, ["source"], [F.col("__t"), F.col("doc_id")], SAMPLE_K
    )
    return picked.select("source", "doc_id").orderBy("source", "doc_id")


SAMPLE_K_SQL = f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5(concat_ws(chr(31), '{SAMPLE_SEED_K}',
                                         CAST(doc_id AS VARCHAR))), 1, 8),
                    doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {SAMPLE_K} ORDER BY source, doc_id
"""


register(QuerySpec("sample_k_per_source", sample_k_per_source,
                   SAMPLE_K_SQL,
                   "deterministic fixed-K per-group sample: md5-ticket "
                   "rank via skew-safe two-phase top-k; samples nest"))


# ---------------------------------------------------------------------------
# key-skew profile (the salting decision input)
# ---------------------------------------------------------------------------


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size distribution of events per user — the diagnostic that
    decides whether a key needs salting (operators/skew.py): key count,
    row count, min/max/mean group size, p50/p90/p99 group size, and the
    skew factor (max / mean). Two aggregations: per-key counts (one
    keyed shuffle with map-side combine), then stats over ONE ROW PER
    KEY — the second agg's input is already reduced, so the exact
    percentile here is over group-size integers, not data rows."""
    ev = load_table(spark, sf_dir, "events")
    sizes = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    nd = F.col("n").cast("double")
    agged = sizes.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_group"),
        F.max("n").alias("max_group"),
        F.percentile(nd, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
            "__ps"
        ),
    )
    mean = F.col("n_rows") / F.col("n_keys")
    return agged.select(
        "n_keys",
        "n_rows",
        "min_group",
        "max_group",
        F.round(mean, 6).alias("mean_group"),
        F.round(F.element_at("__ps", 1), 6).alias("p50_group"),
        F.round(F.element_at("__ps", 2), 6).alias("p90_group"),
        F.round(F.element_at("__ps", 3), 6).alias("p99_group"),
        F.round(F.col("max_group") / mean, 6).alias("skew_factor"),
    )


SKEW_SQL = """
WITH sizes AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(min(n) AS BIGINT) AS min_group,
       CAST(max(n) AS BIGINT) AS max_group,
       round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_group,
       round(quantile_cont(CAST(n AS DOUBLE), 0.5), 6) AS p50_group,
       round(quantile_cont(CAST(n AS DOUBLE), 0.9), 6) AS p90_group,
       round(quantile_cont(CAST(n AS DOUBLE), 0.99), 6) AS p99_group,
       round(CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / count(*)), 6)
         AS skew_factor
FROM sizes
"""


register(QuerySpec("key_skew_profile", key_skew_profile, SKEW_SQL,
                   "group-size distribution + skew factor per key: the "
                   "input to the salting decision"))


# ---------------------------------------------------------------------------
# budget-capped corpus selection (round 4)
# ---------------------------------------------------------------------------

BUDGET_TOKENS = 900


def corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source greedy token-budget selection
    (operators/sampling.py:select_within_token_budget): rank docs by
    token count desc with an md5-ticket tiebreak, keep the prefix whose
    running token total stays ≤ BUDGET_TOKENS, report the per-source
    selection accounting. Window prefix-sum on both engines over the
    identical deterministic order → exact parity."""
    from kinesis_vcr_spark.operators.sampling import (
        select_within_token_budget,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    )
    base = docs.select("doc_id", "source", toks.alias("n_tokens"))
    sel = select_within_token_budget(
        base, "source", "n_tokens", BUDGET_TOKENS
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("selected"), 1).otherwise(0)).alias(
                "n_selected"
            ),
            F.sum(
                F.when(F.col("selected"), F.col("n_tokens")).otherwise(0)
            ).alias("tokens_selected"),
        )
        .orderBy("source")
    )


BUDGET_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> length(t) > 0)) AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source
           ORDER BY n_tokens DESC,
                    substr(md5(concat_ws(chr(31), 'budget',
                                         CAST(doc_id AS VARCHAR))), 1, 8)
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM base
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cum_tokens <= {BUDGET_TOKENS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       CAST(sum(CASE WHEN cum_tokens <= {BUDGET_TOKENS} THEN n_tokens
                ELSE 0 END) AS BIGINT) AS tokens_selected
FROM ranked GROUP BY source ORDER BY source
"""


register(QuerySpec("corpus_budget_select", corpus_budget_select, BUDGET_SQL,
                   "greedy per-source token-budget selection: "
                   "quality-ranked prefix under a running-total cap"))


# ---------------------------------------------------------------------------
# deterministic weighted sampling (round 4): Efraimidis-Spirakis tickets
# ---------------------------------------------------------------------------

WSAMPLE_K = 5
WSAMPLE_SEED = "wsample"


def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample (k=5, weight = n_chars): md5-ticket
    Efraimidis-Spirakis keys (operators/sampling.py:
    weighted_sample_k_per_group) — char-heavy docs win proportionally
    more slots, yet the draw is fully deterministic, so the DuckDB
    oracle recomputes the identical selection."""
    from kinesis_vcr_spark.operators.sampling import (
        weighted_sample_k_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_k_per_group(
        docs, "source", "n_chars", WSAMPLE_K, seed=WSAMPLE_SEED
    ).select("source", "doc_id", "n_chars").orderBy("source", "doc_id")


WSAMPLE_SQL = f"""
WITH t AS (
  SELECT source, doc_id, n_chars,
         -ln((CAST('0x' || substr(md5(concat_ws(chr(31), '{WSAMPLE_SEED}',
                 CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT) + 0.5)
             / 4294967296.0)
         / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents
  WHERE n_chars > 0
), r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY es_key, doc_id) AS rk
  FROM t
)
SELECT source, doc_id, n_chars FROM r
WHERE rk <= {WSAMPLE_K} ORDER BY source, doc_id
"""


register(QuerySpec("sample_weighted_docs", sample_weighted_docs, WSAMPLE_SQL,
                   "Efraimidis-Spirakis weighted sample without "
                   "replacement: deterministic md5 exponential-jitter "
                   "keys, k per group"))


# ---------------------------------------------------------------------------
# equi-width histogram (round 4): the profiler's distribution view
# ---------------------------------------------------------------------------

HIST_BINS = 10


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of events.value: one stats pass (min/max),
    one binning pass (broadcast stats, map-side-combined groupBy(bin)).
    Bin arithmetic is the identical double expression on both engines
    — floor((v-lo)/((hi-lo)/k)) clamped to k-1, degenerate hi==lo
    collapses to bin 0 — so counts match exactly. NULL values are
    excluded up front (min/max already ignore them; without the filter
    the NULL-skipping LEAST on both engines would silently bucket NULL
    rows into the top bin). At 100 TB the stats pass rides the same
    scan as any profiler column and bins are a k-row result."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    stats = events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width),
            F.lit(HIST_BINS - 1),
        )
    )
    return (
        events.select("value")
        .crossJoin(F.broadcast(stats))
        .select(bin_col.cast("int").alias("bin"), "lo", "hi")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.first("lo")
                + F.col("bin") * ((F.first("hi") - F.first("lo")) / HIST_BINS),
                6,
            ).alias("bin_lo"),
        )
        .select("bin", "bin_lo", "n_rows")
        .orderBy("bin")
    )


HIST_SQL = f"""
WITH e AS (
  SELECT value FROM events WHERE value IS NOT NULL
), s AS (
  SELECT min(value) AS lo, max(value) AS hi FROM e
), b AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE LEAST(CAST(floor((value - lo)
                              / ((hi - lo) / {HIST_BINS}.0)) AS BIGINT),
                         {HIST_BINS - 1}) END AS bin,
         lo, hi
  FROM e, s
)
SELECT CAST(bin AS INTEGER) AS bin,
       round(min(lo) + bin * ((min(hi) - min(lo)) / {HIST_BINS}), 6)
         AS bin_lo,
       CAST(count(*) AS BIGINT) AS n_rows
FROM b GROUP BY bin ORDER BY bin
"""


register(QuerySpec("value_histogram", value_histogram, HIST_SQL,
                   "equi-width histogram: one stats pass + one "
                   "broadcast-binned aggregation"))


# ---------------------------------------------------------------------------
# robust outlier profile (round 4): median/MAD fencing per group
# ---------------------------------------------------------------------------

MAD_FENCE = 3.0


def value_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier accounting: median, MAD (median of
    absolute deviations), and the count of rows beyond median ± 3·MAD —
    the standard heavy-tail-safe fence (z-scores melt when the tail
    drags the mean; the median/MAD pair doesn't). Three keyed
    aggregations + two broadcast joins (the per-type tables are
    group-count-sized); exact PERCENTILE_CONT on both engines, so the
    fence decisions agree row-for-row. Same scale caveat as the
    percentile profile: exact medians hold a value→count map per group
    — swap approx_percentile at 100 TB continuous domains."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("absdev") > F.lit(MAD_FENCE) * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS absdev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN d.absdev > {MAD_FENCE} * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(min(d.med), 6) AS med,
       round(min(m.mad), 6) AS mad
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""


register(QuerySpec("value_outlier_profile", value_outlier_profile, MAD_SQL,
                   "median/MAD robust outlier fence per group: "
                   "heavy-tail-safe anomaly accounting"))


# ---------------------------------------------------------------------------
# semi-structured extraction (round 4): JSON payload columns
# ---------------------------------------------------------------------------


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` payload + per-type
    profile of the extracted field. ``from_json`` with an EXPLICIT
    schema — never schema inference, which is a second full scan at
    100 TB and a silent schema-drift hazard; unparseable payloads
    surface as NULLs (counted, not dropped). One scan, one
    map-side-combined aggregate."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").alias("p"),
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 6).alias("k_mean"),
            F.count_distinct("k").alias("k_distinct"),
        )
        .orderBy("event_type")
    )


# Parity guard (ADVICE r04): Spark's from_json yields NULL for
# malformed JSON or a non-integral k, while a bare DuckDB
# CAST(json_extract(...) AS BIGINT) would ERROR on malformed props and
# ROUND non-integral numbers. json_valid + TRY_CAST of the extracted
# text make DuckDB take the same NULL path ('1.5' → NULL, not 2).
# Remaining fixture assumption (documented, not load-bearing today):
# a JSON-string-typed k ("42" with quotes) would still diverge —
# Spark NULLs it, TRY_CAST parses it; the generator emits numeric k.
JSON_SQL = """
WITH parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(k) AS BIGINT) AS n_parsed,
       CAST(sum(k) AS BIGINT) AS k_total,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max,
       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS k_mean,
       CAST(count(DISTINCT k) AS BIGINT) AS k_distinct
FROM parsed GROUP BY event_type ORDER BY event_type
"""


register(QuerySpec("events_json_extract", events_json_extract, JSON_SQL,
                   "typed JSON payload extraction (explicit schema, no "
                   "inference) + per-type field profile"))


# ---------------------------------------------------------------------------
# data-contract expectations (round 4): the pre-training validation gate
# ---------------------------------------------------------------------------

EXPECT_TYPES = ("click", "view", "purchase", "signup", "error")
EXPECT_VALUE_HI = 100.0  # deliberately tight: the report must SHOW violations


def events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative contract gate over events
    (operators/validate.py): six rules — id present/unique, value in
    [0, 100) (tight on purpose so real rows violate and the counting
    path is exercised), type in the known set, props JSON-shaped, and a
    cross-column implication — ALL evaluated in ONE aggregation pass
    over one scan; the report unpivots to a row per rule."""
    from kinesis_vcr_spark.operators.validate import (
        expect_expr,
        expect_in_range,
        expect_in_set,
        expect_matches,
        expect_not_null,
        expect_unique,
        validate,
    )

    events = load_table(spark, sf_dir, "events")
    report = validate(
        events,
        [
            expect_not_null("event_id"),
            expect_unique("event_id"),
            expect_in_range("value", lo=0.0, hi=EXPECT_VALUE_HI),
            expect_in_set("event_type", EXPECT_TYPES),
            expect_matches("props", r"^\{"),
            expect_expr(
                "purchase_has_value",
                "event_type <> 'purchase' OR value IS NOT NULL",
            ),
        ],
    )
    return report.select(
        "rule", "violations", "n_rows",
        F.col("passed").cast("int").alias("passed"),
    ).orderBy("rule")


EXPECT_SQL = f"""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_notnull,
    CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS v_unique,
    CAST(sum(CASE WHEN value IS NULL OR value < 0.0
                    OR value >= {EXPECT_VALUE_HI} THEN 1 ELSE 0 END)
         AS BIGINT) AS v_range,
    CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                    {EXPECT_TYPES} THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
    CAST(sum(CASE WHEN props IS NULL
                    OR NOT regexp_matches(props, '^\\{{')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_match,
    CAST(sum(CASE WHEN NOT coalesce(
                    event_type <> 'purchase' OR value IS NOT NULL, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_expr
  FROM events
)
SELECT rule, violations, n AS n_rows,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
FROM (
  SELECT 'event_id_not_null' AS rule, v_notnull AS violations, n FROM agg
  UNION ALL SELECT 'event_id_unique', v_unique, n FROM agg
  UNION ALL SELECT 'value_in_range', v_range, n FROM agg
  UNION ALL SELECT 'event_type_in_set', v_set, n FROM agg
  UNION ALL SELECT 'props_matches', v_match, n FROM agg
  UNION ALL SELECT 'purchase_has_value', v_expr, n FROM agg
) ORDER BY rule
"""


register(QuerySpec("events_expectations", events_expectations, EXPECT_SQL,
                   "declarative data-contract gate: 6 rules, one "
                   "aggregation pass, unpivoted violations report"))


# ---------------------------------------------------------------------------
# CDC merge (round 4): change-feed apply as a query
# ---------------------------------------------------------------------------

CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_MOD = 7, 13, 11
CDC_INS_OFFSET = 5_000_000


def corpus_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE semantics on a deterministic change feed
    (operators/cdc.py): every 7th doc updated, every 13th deleted
    (delete sequenced AFTER the update, so doc_ids divisible by 91
    exercise the ordering), every 11th cloned as an insert under a new
    key; per-source accounting of the resulting snapshot. The oracle
    reconstructs the final state relationally — equal output proves
    latest-wins, delete-beats-stale-update, and insert paths all
    landed."""
    from kinesis_vcr_spark.operators.cdc import apply_cdc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    upd = docs.where(F.col("doc_id") % CDC_UPD_MOD == 0).select(
        "doc_id", "source",
        F.concat("text", F.lit(" [edited]")).alias("text"),
        F.lit("U").alias("op"), F.col("doc_id").alias("seq"),
    )
    dele = docs.where(F.col("doc_id") % CDC_DEL_MOD == 0).select(
        "doc_id", "source", F.lit(None).cast("string").alias("text"),
        F.lit("D").alias("op"),
        (F.col("doc_id") + 1_000_000).alias("seq"),
    )
    ins = docs.where(F.col("doc_id") % CDC_INS_MOD == 0).select(
        (F.col("doc_id") + CDC_INS_OFFSET).alias("doc_id"), "source",
        F.concat(F.lit("NEW "), "text").alias("text"),
        F.lit("U").alias("op"), F.col("doc_id").alias("seq"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    snap = apply_cdc(docs, changes, ["doc_id"], "seq")
    return (
        snap.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("source")
    )


CDC_SQL = f"""
WITH survivors AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % {CDC_UPD_MOD} = 0 THEN text || ' [edited]'
              ELSE text END AS text
  FROM documents WHERE doc_id % {CDC_DEL_MOD} <> 0
), inserts AS (
  SELECT doc_id + {CDC_INS_OFFSET} AS doc_id, source, 'NEW ' || text AS text
  FROM documents WHERE doc_id % {CDC_INS_MOD} = 0
), final AS (
  SELECT * FROM survivors UNION ALL SELECT * FROM inserts
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM final GROUP BY source ORDER BY source
"""


register(QuerySpec("corpus_cdc_apply", corpus_cdc_apply, CDC_SQL,
                   "CDC merge: one-window latest-wins upsert+delete "
                   "apply, relationally-reconstructed oracle"))


# ---------------------------------------------------------------------------
# categorical dependence (round 4): chi-square independence screen
# ---------------------------------------------------------------------------


def source_lang_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic between ``source`` and
    ``lang`` — the dependence screen for training-mix design (a strong
    source×lang association means per-source sampling silently skews
    language balance). All counting is exact bigint; the one float op
    per CONTINGENCY CELL — (o·n − r·c)²/(n·r·c), zero cells included —
    is fixed to integer micro-units before the cross-cell sum, the same
    order-independence discipline as the LM scores (a plain double sum
    over cells would be partition-order-dependent). Works off the
    cell table (groupBy source, lang — map-side combined), so the
    corpus is scanned once; at bigint-overflow scale (o·n beyond 2^63)
    switch the difference to DOUBLE, noted here deliberately."""
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("source", "lang").agg(F.count("*").alias("o"))
    r = o.groupBy("source").agg(F.sum("o").alias("r"))
    c = o.groupBy("lang").agg(F.sum("o").alias("c"))
    n = o.agg(F.sum("o").alias("n"))
    cells = (
        r.crossJoin(c)
        .join(o, ["source", "lang"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "source", "lang", F.coalesce("o", F.lit(0)).alias("o"),
            "r", "c", "n",
        )
    )
    d = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    contrib = (
        F.round(
            d.cast("double") * d
            / (F.col("n").cast("double") * F.col("r") * F.col("c"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("cm")
    )
    agged = cells.select(
        contrib, "n",
        F.col("source").alias("s"), F.col("lang").alias("l"),
    ).agg(
        F.sum("cm").alias("chi2_micro"),
        F.max("n").alias("n_rows"),
        F.count_distinct("s").alias("n_sources"),
        F.count_distinct("l").alias("n_langs"),
    )
    return agged.select(
        "n_rows", "n_sources", "n_langs",
        ((F.col("n_sources") - 1) * (F.col("n_langs") - 1)).alias("dof"),
        "chi2_micro",
        F.round(F.col("chi2_micro") / 1000000.0, 6).alias("chi2"),
    )


CHI2_SQL = """
WITH o AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
), r AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY source
), c AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY lang
), n AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM o
), cells AS (
  SELECT r.source, c.lang, CAST(coalesce(o.o, 0) AS BIGINT) AS o,
         r.r, c.c, n.n
  FROM r CROSS JOIN c
  LEFT JOIN o USING (source, lang)
  CROSS JOIN n
), contrib AS (
  SELECT n, source, lang,
         CAST(round(CAST(o * n - r * c AS DOUBLE) * (o * n - r * c)
                    / (CAST(n AS DOUBLE) * r * c) * 1000000.0)
              AS BIGINT) AS cm
  FROM cells
)
SELECT CAST(max(n) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
            AS BIGINT) AS dof,
       CAST(sum(cm) AS BIGINT) AS chi2_micro,
       round(CAST(sum(cm) AS BIGINT) / 1000000.0, 6) AS chi2
FROM contrib
"""


register(QuerySpec("source_lang_chi2", source_lang_chi2, CHI2_SQL,
                   "chi-square independence screen for the training "
                   "mix: exact-counted cells, micro-fixed per-cell "
                   "contributions, order-independent sum"))


# ---------------------------------------------------------------------------
# cohort retention (round 4): the classic activity matrix
# ---------------------------------------------------------------------------


def user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted by how many are active k weeks later. Two keyed
    aggregations — first-seen per user (map-side combined min), then
    distinct users per (cohort, offset) — all exact counting, no
    floats except the final rate (exact ratio of bigints, rounded).
    Week arithmetic is done in integer days-since-epoch on both
    engines (floor(days/7)), sidestepping engine week-of-year
    conventions entirely."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        F.floor(F.datediff(F.col("ts").cast("date"),
                           F.lit("1970-01-01").cast("date")) / 7).alias(
            "week"
        ),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        ev.join(first, "user_id")
        .select(
            "user_id", "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_active", "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
  FROM events
), first AS (
  SELECT user_id, CAST(min(week) AS BIGINT) AS cohort_week
  FROM ev GROUP BY user_id
), pairs AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         e.week - f.cohort_week AS week_offset
  FROM ev e JOIN first f USING (user_id)
), cells AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM pairs GROUP BY cohort_week, week_offset
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_week
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       round(c.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM cells c JOIN sizes s USING (cohort_week)
ORDER BY c.cohort_week, c.week_offset
"""


register(QuerySpec("user_cohort_retention", user_cohort_retention,
                   COHORT_SQL,
                   "weekly cohort retention matrix: integer-week "
                   "arithmetic, exact counts, two keyed aggregations"))


# ---------------------------------------------------------------------------
# PageRank over the event-succession graph (operators/pagerank.py)
# ---------------------------------------------------------------------------

PR_ITERATIONS = 10
PR_DAMPING_PCT = 85
PR_UNIT = 1_000_000
PR_TOP_K = 20


def user_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank over the event-succession graph: a
    directed (multi-)edge from the user of each event to the user of
    the NEXT event of the same type (LAG by event_id within type) —
    "whose activity do you follow". Ranks are int64 micro-units so 10
    damped iterations are bit-identical across engines (the oracle
    unrolls the same 10 steps as chained CTEs; recursive CTEs can't
    aggregate). Top-20 by rank, total order.

    Graph derivation note: the per-type LAG serializes each event_type
    through one window partition — fine for a 5-type fixture, and the
    derivation is fixture glue; the scale-relevant piece is the
    operator (edges never shuffle per iteration, see
    operators/pagerank.py)."""
    from kinesis_vcr_spark.operators.pagerank import pagerank_micro

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    lagw = Window.partitionBy("event_type").orderBy("event_id")
    edges = (
        ev.select(
            "event_id", "event_type",
            F.col("user_id").alias("dst_user"),
            F.lag("user_id").over(lagw).alias("src_user"),
        )
        .where(F.col("src_user").isNotNull())
        .select("src_user", "dst_user")
    )
    ranks = pagerank_micro(
        edges, "src_user", "dst_user",
        iterations=PR_ITERATIONS, damping_pct=PR_DAMPING_PCT, unit=PR_UNIT,
    )
    return (
        ranks.select(
            F.col("node").alias("user_id"),
            "rank_micro",
            F.round(F.col("rank_micro") / F.lit(float(PR_UNIT)), 6).alias(
                "rank"
            ),
        )
        .orderBy(F.col("rank_micro").desc(), "user_id")
        .limit(PR_TOP_K)
    )


def _pagerank_sql() -> str:
    iters = "".join(
        f""", r{i + 1} AS (
  SELECT n.node,
         CAST(({PR_DAMPING_PCT} * COALESCE(s.c, 0)) // 100
           + {((100 - PR_DAMPING_PCT) * PR_UNIT) // 100} AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas would float
    SELECT e.dst AS node, CAST(SUM((r.r // o.od) * e.w) AS BIGINT) AS c
    FROM e JOIN r{i} r ON r.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        for i in range(PR_ITERATIONS)
    )
    return f"""
WITH lagd AS (
  SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY event_id)
           AS src,
         user_id AS dst
  FROM events
), e AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM lagd WHERE src IS NOT NULL GROUP BY src, dst
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), outdeg AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS od FROM e GROUP BY src
), r0 AS (
  SELECT node, CAST({PR_UNIT} AS BIGINT) AS r FROM nodes
){iters}
SELECT node AS user_id, r AS rank_micro,
       round(r / {PR_UNIT}.0, 6) AS rank
FROM r{PR_ITERATIONS}
ORDER BY rank_micro DESC, user_id
LIMIT {PR_TOP_K}
"""


register(QuerySpec("user_pagerank", user_pagerank, _pagerank_sql(),
                   "exact-integer PageRank: 10 damped iterations over "
                   "the event-succession graph, bit-identical micro-"
                   "unit ranks, top-20"))


# ---------------------------------------------------------------------------
# multi-source BFS over the event-succession graph (operators/bfs.py)
# ---------------------------------------------------------------------------

BFS_SEED_MOD = 100
BFS_MAX_DEPTH = 4


def user_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop reach audit: min directed hop distance from the seed
    cohort (user_id % 100 == 0) to every user within 4 hops of it on
    the event-succession graph (same edge derivation as
    ``user_pagerank``). Exact integer distances → the recursive-CTE
    oracle reproduces them bit-for-bit; per-seed-cohort reach counts
    are the "blast radius" shape used for contamination audits."""
    from kinesis_vcr_spark.operators.bfs import bfs_distances

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    lagw = Window.partitionBy("event_type").orderBy("event_id")
    edges = (
        ev.select(
            "event_type",
            F.col("user_id").alias("dst_user"),
            F.lag("user_id").over(lagw).alias("src_user"),
        )
        .where(F.col("src_user").isNotNull())
        .select("src_user", "dst_user")
    )
    seeds = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id"))
        .where(F.col("user_id") % BFS_SEED_MOD == 0)
        .distinct()
    )
    dist = bfs_distances(
        edges, "src_user", "dst_user", seeds, "user_id",
        max_depth=BFS_MAX_DEPTH,
    )
    return (
        dist.select(F.col("node").alias("user_id"), "distance")
        .orderBy("user_id")
    )


BFS_SQL = f"""
WITH RECURSIVE lagd AS (
  SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY event_id)
           AS src,
         user_id AS dst
  FROM events
), e AS (
  SELECT DISTINCT src, dst FROM lagd WHERE src IS NOT NULL
), seeds AS (
  SELECT DISTINCT user_id AS node FROM events
  WHERE user_id % {BFS_SEED_MOD} = 0
), reach(node, depth) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN e ON e.src = r.node
  WHERE r.depth < {BFS_MAX_DEPTH}
)
SELECT node AS user_id, CAST(min(depth) AS BIGINT) AS distance
FROM reach GROUP BY node ORDER BY user_id
"""


register(QuerySpec("user_reach_bfs", user_reach_bfs, BFS_SQL,
                   "multi-source BFS: exact min hop distances within 4 "
                   "hops of the seed cohort on the succession graph"))


# ---------------------------------------------------------------------------
# triangle counting over the event-succession graph (operators/triangles.py)
# ---------------------------------------------------------------------------

TRI_TOP_K = 20


def user_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-clustering audit: triangles each user participates in on
    the undirected event-succession graph (same edge derivation as
    ``user_pagerank``, direction dropped). Exact integer counts →
    bit-identical oracle. Top-20 by (triangles, user_id), total order.

    The Spark side runs the degree-oriented compact-forward plan
    (operators/triangles.py — O(m^1.5) wedge bound, hub out-degree
    ~0); the oracle closes the same triangle set with plain id-ordered
    three-way self-joins, pinning that the orientation is execution
    strategy, not semantics."""
    from kinesis_vcr_spark.operators.triangles import triangle_counts

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    lagw = Window.partitionBy("event_type").orderBy("event_id")
    edges = (
        ev.select(
            "event_type",
            F.col("user_id").alias("dst_user"),
            F.lag("user_id").over(lagw).alias("src_user"),
        )
        .where(F.col("src_user").isNotNull())
        .select("src_user", "dst_user")
    )
    # auto pivot-chunking: resolves to the unchanged single-job plan at
    # every fixture scale; at sf100 (4.0 G wedges ≈ 100 GB shuffle, more
    # than a single machine's scratch disk) it splits the pivot set so
    # peak spill is one chunk's wedges (operators/triangles.py, r07)
    counts = triangle_counts(edges, "src_user", "dst_user", pivot_chunks=None)
    return (
        counts.select(F.col("node").alias("user_id"), "triangles")
        .orderBy(F.col("triangles").desc(), "user_id")
        .limit(TRI_TOP_K)
    )


TRIANGLES_SQL = f"""
WITH lagd AS (
  SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY event_id)
           AS src,
         user_id AS dst
  FROM events
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM lagd WHERE src IS NOT NULL AND src <> dst
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
), pern AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT node AS user_id, triangles FROM pern
ORDER BY triangles DESC, user_id
LIMIT {TRI_TOP_K}
"""


register(QuerySpec("user_triangles", user_triangles, TRIANGLES_SQL,
                   "exact per-node triangle counts on the undirected "
                   "succession graph, degree-oriented compact-forward "
                   "plan, top-20"))


# ---------------------------------------------------------------------------
# per-type metric trend via grouped OLS (operators/regression.py)
# ---------------------------------------------------------------------------

TREND_EPOCH = "2024-01-01"


def event_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-drift monitor: per event type, the OLS linear trend of
    event value over the day index (days since 2024-01-01) — the
    "is this metric creeping" primitive for pipeline health dashboards.
    One map-side-combining aggregation computes the five sufficient
    statistics (exact int64 x-sums, exact DECIMAL(18,4) y-sums); the
    closed form then runs in bit-deterministic doubles, so slope,
    intercept and R² hash identically on both engines."""
    from kinesis_vcr_spark.operators.regression import grouped_ols

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.to_date(F.lit(TREND_EPOCH))
        ).alias("day_idx"),
        "value",
    )
    return (
        grouped_ols(base, ["event_type"], "day_idx", "value")
        .orderBy("event_type")
    )


def _trend_sql() -> str:
    from kinesis_vcr_spark.operators.regression import ols_oracle_sql

    inner = ols_oracle_sql(
        "events",
        ["event_type"],
        f"CAST(ts AS DATE) - DATE '{TREND_EPOCH}'",
        "value",
    )
    return f"SELECT * FROM ({inner}) ORDER BY event_type"


register(QuerySpec("event_value_trend", event_value_trend, _trend_sql(),
                   "grouped OLS metric trend: exact sufficient-"
                   "statistics aggregation, closed-form slope/"
                   "intercept/R² in deterministic doubles"))


# ---------------------------------------------------------------------------
# k-core of the customer-supplier graph (operators/kcore.py)
# ---------------------------------------------------------------------------

KCORE_K = 30
KCORE_MAX_ITER = 6


def customer_supplier_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-trading-core audit: the 30-core of the bipartite
    customer↔supplier graph (an edge per distinct trading pair from
    orders ⋈ lineitem; node ids namespaced even/odd). Suppliers serve
    hundreds of customers so the peeling removes thin-degree customers
    only — a non-trivial strict subset at every fixture scale. The
    Spark side peels to the TRUE fixpoint with a loud
    ``max_iterations`` guard set to the oracle's unroll depth
    (operators/kcore.py docstring); the oracle unrolls exactly that
    many peel steps, and steps past convergence are no-ops, so the
    results agree whenever the guard doesn't fire."""
    from kinesis_vcr_spark.operators.kcore import kcore_nodes

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    core = kcore_nodes(
        edges, "src", "dst", KCORE_K, max_iterations=KCORE_MAX_ITER
    )
    return (
        core.select(
            F.when(F.pmod("node", F.lit(2)) == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("entity"),
            (F.col("node") / 2).cast("long").alias("entity_id"),
            "core_deg",
        )
        .orderBy("entity", "entity_id")
    )


def _kcore_sql() -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    # peel step references its predecessor three times -> 3^steps
    # rescans of orders ⋈ lineitem without it (measured: fd exhaustion)
    sql = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)"""
    for i in range(KCORE_MAX_ITER):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}
  ) GROUP BY node
), bad{i} AS MATERIALIZED (
  SELECT node FROM d{i} WHERE deg < {KCORE_K}
), e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a NOT IN (SELECT node FROM bad{i})
    AND b NOT IN (SELECT node FROM bad{i})
)"""
    sql += f""",
dfin AS (
  SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM (
    SELECT a AS node FROM e{KCORE_MAX_ITER}
    UNION ALL SELECT b FROM e{KCORE_MAX_ITER}
  ) GROUP BY node
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity,
       CAST(node // 2 AS BIGINT) AS entity_id,
       core_deg
FROM dfin ORDER BY entity, entity_id"""
    return sql


register(QuerySpec("customer_supplier_kcore", customer_supplier_kcore,
                   _kcore_sql(),
                   "k-core of the bipartite customer-supplier trading "
                   "graph: iterative peeling to the fixpoint, unrolled-"
                   "peel oracle"))


# ---------------------------------------------------------------------------
# mergeable quantile sketch (E86) — exact-parity audit
# ---------------------------------------------------------------------------

#: quantile probes for the sketch audit. Plain binary-representable
#: plus one that is not (0.95): both engines parse the same IEEE
#: double, so ceil(q*m) agrees bit-for-bit.
QSK_QS = (0.25, 0.5, 0.75, 0.95)
QSK_SEED = "qsk7"
QSK_QUERY_K = 256


def price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile-sketch audit over lineitem prices: per
    ``l_returnflag``, each probe quantile's SKETCH estimate (the
    deterministic bottom-k ticket sample of
    :func:`~kinesis_vcr_spark.operators.quantiles.quantile_sketch`)
    next to the EXACT discrete quantile of the full column. Unlike the
    HLL audit's within-tolerance flag, the estimate itself is
    oracle-checked: the ticket is engine-portable md5 hex, so DuckDB
    rebuilds the identical sample and the est column matches
    bit-for-bit — a silent regression anywhere in the sketch (ticket
    expression, cut prefilter, sort/slice, rank formula) flips the
    driver row red.

    Scale posture: the sketch side is the 100 TB path (one HLL-cut
    pass + bounded O(k) state per key). The exact side is the audit
    harness — a per-group window sort (spillable, distributed by
    group) that a production run would simply not execute."""
    from pyspark.sql import Window

    from kinesis_vcr_spark.operators.quantiles import (
        quantile_from_sketch,
        quantile_sketch,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    sk = quantile_sketch(
        li,
        ["l_returnflag"],
        "v",
        ["l_orderkey", "l_linenumber"],
        k=QSK_QUERY_K,
        seed=QSK_SEED,
    )
    est = sk.select(
        "l_returnflag",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        quantile_from_sketch(F.col("qs"), q).alias(
                            "est_price"
                        ),
                    )
                    for q in QSK_QS
                ]
            )
        ).alias("__s"),
    ).select("l_returnflag", "__s.q", "__s.est_price")

    wv = Window.partitionBy("l_returnflag").orderBy("v")
    wn = Window.partitionBy("l_returnflag")
    exact = (
        li.withColumn("__vr", F.row_number().over(wv))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .select(
            "l_returnflag",
            "v",
            "__vr",
            "__n",
            F.explode(
                F.array(*[F.lit(float(q)) for q in QSK_QS])
            ).alias("q"),
        )
        .where(
            F.col("__vr")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("q") * F.col("__n")).cast("long"),
            )
        )
        .select("l_returnflag", "q", F.col("v").alias("exact_price"))
    )
    return (
        est.join(exact, ["l_returnflag", "q"])
        .select("l_returnflag", "q", "est_price", "exact_price")
        .orderBy("l_returnflag", "q")
    )


def _qsk_sql() -> str:
    qvals = ", ".join(f"({q})" for q in QSK_QS)
    return f"""
WITH hashed AS (
  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS v,
         substr(md5(concat_ws(chr(31), '{QSK_SEED}',
                    CAST(l_orderkey AS VARCHAR),
                    CAST(l_linenumber AS VARCHAR))), 1, 8) AS t
  FROM lineitem
), qs(q) AS (VALUES {qvals}),
samp AS (
  SELECT grp, v FROM (
    SELECT grp, v,
           row_number() OVER (PARTITION BY grp ORDER BY t, v) AS rn
    FROM hashed
  ) WHERE rn <= {QSK_QUERY_K}
), sranked AS (
  SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS vr,
         count(*) OVER (PARTITION BY grp) AS m
  FROM samp
), est AS (
  SELECT s.grp, q.q, s.v AS est_price
  FROM sranked s JOIN qs q
    ON s.vr = greatest(1, CAST(ceil(q.q * s.m) AS BIGINT))
), franked AS (
  SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS vr,
         count(*) OVER (PARTITION BY grp) AS n
  FROM hashed
), exact AS (
  SELECT f.grp, q.q, f.v AS exact_price
  FROM franked f JOIN qs q
    ON f.vr = greatest(1, CAST(ceil(q.q * f.n) AS BIGINT))
)
SELECT e.grp AS l_returnflag, CAST(e.q AS DOUBLE) AS q,
       e.est_price, x.exact_price
FROM est e JOIN exact x ON e.grp = x.grp AND e.q = x.q
ORDER BY l_returnflag, q
"""


register(QuerySpec("price_quantile_sketch", price_quantile_sketch,
                   _qsk_sql(),
                   "mergeable quantile sketch audit: deterministic "
                   "bottom-k ticket sample estimates vs exact discrete "
                   "quantiles, est values oracle-checked bit-for-bit"))


# ---------------------------------------------------------------------------
# k-anonymity privacy profile (operators/kanon.py)
# ---------------------------------------------------------------------------

KANON_KS = (2, 5, 10, 25)
KANON_BAL_WIDTH = 1000.0


def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk ladder on customer quasi-identifiers
    (nation × market segment × $1000 balance bracket): per k, the rows
    living in QI-groups smaller than k — what suppression would have to
    drop before the table is k-anonymous. One QI hash-agg + a single-row
    global agg (operators/kanon.py)."""
    from kinesis_vcr_spark.operators.kanon import (  # noqa: PLC0415
        generalize_numeric,
        k_anonymity_profile,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        generalize_numeric("c_acctbal", KANON_BAL_WIDTH).alias("bal_bracket"),
    )
    return k_anonymity_profile(
        cust, ["c_nationkey", "c_mktsegment", "bal_bracket"], ks=KANON_KS
    ).orderBy("k")


KANON_SQL = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / {KANON_BAL_WIDTH}) AS BIGINT) AS bal_bracket
  FROM customer
), sizes AS (
  SELECT c_nationkey, c_mktsegment, bal_bracket,
         CAST(count(*) AS BIGINT) AS group_size
  FROM qi GROUP BY 1, 2, 3
), ks(k) AS (
  SELECT * FROM (VALUES {', '.join(f'({k})' for k in KANON_KS)})
), tot AS (
  SELECT CAST(sum(group_size) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(min(group_size) AS BIGINT) AS min_group_size
  FROM sizes
)
SELECT CAST(ks.k AS BIGINT) AS k,
       tot.n_rows, tot.n_groups, tot.min_group_size,
       CAST(sum(CASE WHEN s.group_size < ks.k THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below,
       CAST(sum(CASE WHEN s.group_size < ks.k THEN s.group_size ELSE 0 END)
            AS BIGINT) AS rows_below,
       round(CAST(sum(CASE WHEN s.group_size < ks.k THEN s.group_size
                           ELSE 0 END) AS DOUBLE)
             / CAST(tot.n_rows AS DOUBLE), 6) AS pct_rows_below
FROM sizes s CROSS JOIN ks CROSS JOIN tot
GROUP BY ks.k, tot.n_rows, tot.n_groups, tot.min_group_size
ORDER BY k
"""


register(QuerySpec("customer_k_anonymity", customer_k_anonymity, KANON_SQL,
                   "privacy governance: k-anonymity risk ladder over "
                   "customer quasi-identifiers, one QI hash-agg"))
