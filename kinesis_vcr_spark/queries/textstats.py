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


# ---------------------------------------------------------------------------
# E94: HTML → text extraction + boilerplate signals (inject-then-
# extract: the fixture text is plain, so each doc is wrapped in one of
# four deterministic HTML shapes and the oracle wraps identically)
# ---------------------------------------------------------------------------


def _html_wrapped(docs: DataFrame) -> DataFrame:
    """doc_id % 4 picks the markup shape: plain paragraphs; script+
    style+entity noise; navigation-heavy (anchors around and inside
    the content); comments+headings+br. Every shape embeds the
    document's own text so extraction is content-bearing."""
    v = F.pmod("doc_id", F.lit(4))
    t = F.col("text")
    html = (
        F.when(v == 0, F.concat(
            F.lit("<html><body><p>"), t, F.lit("</p></body></html>")))
        .when(v == 1, F.concat(
            F.lit("<script>var x = 1 < 2;</script><style>p {color:red}"
                  "</style><p>"), t, F.lit(" &amp; more &lt;here&gt;</p>")))
        .when(v == 2, F.concat(
            F.lit("<div><a href=\"/\">Home</a> | <a href=\"/a\">About us"
                  "</a><p>"), t, F.lit("</p><a href=\"/c\">Contact</a>"
                  "</div>")))
        .otherwise(F.concat(
            F.lit("<!-- header --><h1>Title &quot;h&quot;</h1>"), t,
            F.lit("<br>tail &#39;line&#39; &nbsp;end")))
    )
    return docs.select("doc_id", "source", html.alias("html"))


def html_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-removal audit per injected HTML shape (E94): extract
    text with the Catalyst regexp chain, fold the boilerplate signals
    to exact integers (ratios micro-fixed before summing — the
    repo-wide float discipline), one narrow projection + one tiny
    aggregation."""
    from kinesis_vcr_spark.functions.html import (  # noqa: PLC0415
        html_signals, html_to_text,
    )

    docs = _html_wrapped(load_table(spark, sf_dir, "documents"))
    with_text = docs.withColumn("t", html_to_text(F.col("html")))
    sig = with_text.select(
        F.pmod("doc_id", F.lit(4)).alias("variant"),
        *html_signals(F.col("html"), F.col("t")),
    )
    return (
        sig.groupBy("variant")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("text_chars").alias("sum_text_chars"),
            F.sum("html_chars").alias("sum_html_chars"),
            F.sum(F.round(F.col("markup_ratio") * 1e6).cast("long"))
            .alias("sum_markup_micro"),
            F.sum("n_tags").alias("sum_tags"),
            F.sum("n_links").alias("sum_links"),
            F.sum(F.round(F.col("link_text_density") * 1e6).cast("long"))
            .alias("sum_linkdens_micro"),
        )
        .orderBy("variant")
    )


def _html_sql() -> str:
    from kinesis_vcr_spark.functions.html import html_to_text_sql

    wrap = """CASE doc_id % 4
      WHEN 0 THEN '<html><body><p>' || text || '</p></body></html>'
      WHEN 1 THEN '<script>var x = 1 < 2;</script><style>p {color:red}</style><p>'
                  || text || ' &amp; more &lt;here&gt;</p>'
      WHEN 2 THEN '<div><a href="/">Home</a> | <a href="/a">About us</a><p>'
                  || text || '</p><a href="/c">Contact</a></div>'
      ELSE '<!-- header --><h1>Title &quot;h&quot;</h1>' || text
           || '<br>tail &#39;line&#39; &nbsp;end'
    END"""
    return f"""
WITH wrapped AS (
  SELECT doc_id, {wrap} AS html FROM documents
), extracted AS (
  SELECT doc_id, html, {html_to_text_sql("html")} AS t FROM wrapped
), sig AS (
  SELECT doc_id % 4 AS variant,
         length(t) AS text_chars,
         length(html) AS html_chars,
         round(CASE WHEN length(html) > 0
               THEN 1.0 - CAST(length(t) AS DOUBLE)
                    / CAST(length(html) AS DOUBLE) ELSE 0.0 END, 6)
           AS markup_ratio,
         len(regexp_extract_all(html, '(?s)<[^>]+>')) AS n_tags,
         len(regexp_extract_all(html, '(?is)<a\\b[^>]*>')) AS n_links,
         round(CASE WHEN length(regexp_replace(t, '\\s+', '', 'g')) > 0
               THEN CAST(length(regexp_replace(
                      -- array_to_string([]) is NULL in DuckDB, not ''
                      coalesce(array_to_string(regexp_extract_all(
                        html, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), ''), ''),
                      '(?s)<[^>]+>|\\s+', '', 'g')) AS DOUBLE)
                    / CAST(length(regexp_replace(t, '\\s+', '', 'g'))
                           AS DOUBLE)
               ELSE 0.0 END, 6) AS link_text_density
  FROM extracted
)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(text_chars) AS BIGINT) AS sum_text_chars,
       CAST(sum(html_chars) AS BIGINT) AS sum_html_chars,
       CAST(sum(CAST(round(markup_ratio * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_markup_micro,
       CAST(sum(n_tags) AS BIGINT) AS sum_tags,
       CAST(sum(n_links) AS BIGINT) AS sum_links,
       CAST(sum(CAST(round(link_text_density * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_linkdens_micro
FROM sig GROUP BY variant ORDER BY variant
"""


register(QuerySpec("html_extract_stats", html_extract_stats, _html_sql(),
                   "HTML→text extraction + boilerplate signals: "
                   "script/style/comment strip, block-boundary "
                   "newlines, entity decode, markup/link-density "
                   "accounting — one shared regexp chain, oracle "
                   "generated from the same step table"))


# ---------------------------------------------------------------------------
# Unicode script profile (E105, r12) — planted multi-script corpus
# ---------------------------------------------------------------------------

#: deterministic script plant: every mod-4 class of docs gets its
#: high-frequency Latin letters transliterated into another script
#: (translate() is 1:1 and identical in both engines), so the profile
#: row exercises real non-Latin dominance instead of an all-ASCII
#: corpus's vacuous 'latin 1.0'. ~75% of English letters are covered
#: by 'aeiounrsth', so the planted scripts dominate decisively.
SCRIPT_PLANT_FROM = "aeiounrsth"
SCRIPT_PLANT_TO = {
    1: "аеиоунрстх",   # Cyrillic
    2: "αειουνρστθ",   # Greek
    3: "中文字符集数据处理器",  # CJK
}


def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus script composition over the planted multi-script corpus:
    per dominant script — doc count and the summed per-doc dominant
    ratio in integer micro-units (exact cross-engine arithmetic; ratio
    = dominant-script chars / all counted script chars)."""
    from kinesis_vcr_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    plant = F.col("text")
    for m, to in SCRIPT_PLANT_TO.items():
        plant = F.when(
            F.pmod("doc_id", F.lit(4)) == m,
            F.translate(F.col("text"), SCRIPT_PLANT_FROM, to),
        ).otherwise(plant)
    planted = docs.select("doc_id", plant.alias("t"))
    counts = script_counts(F.col("t"))
    total = sum(counts.values())
    dom = dominant_script(F.col("t"))
    per_doc = planted.select(
        dom.alias("script"),
        F.greatest(*counts.values()).alias("__dom_n"),
        total.alias("__tot"),
    )
    return (
        per_doc.groupBy("script")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.round(
                    F.col("__dom_n") * F.lit(1_000_000.0) / F.col("__tot")
                ).cast("long")
            ).alias("ratio_micros_sum"),
        )
        .orderBy("script")
    )


def _script_sql_class(script: str) -> str:
    """RE2 (DuckDB) character class for a script's ranges."""
    from kinesis_vcr_spark.functions.text import SCRIPT_RANGES

    parts = "".join(
        f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in SCRIPT_RANGES[script]
    )
    return f"[{parts}]"


def _script_profile_sql() -> str:
    from kinesis_vcr_spark.functions.text import SCRIPT_ORDER

    cnt = {
        s: (
            f"length(t) - length(regexp_replace(t, "
            f"'{_script_sql_class(s)}', '', 'g'))"
        )
        for s in SCRIPT_ORDER
    }
    case_plant = " ".join(
        f"WHEN doc_id % 4 = {m} THEN "
        f"translate(text, '{SCRIPT_PLANT_FROM}', '{to}')"
        for m, to in SCRIPT_PLANT_TO.items()
    )
    # dominance: strictly-greater against later-priority scripts,
    # greater-or-equal against earlier ones == first max in order
    conds = []
    for i, s in enumerate(SCRIPT_ORDER):
        parts = [f"c_{s} > 0"]
        for j, o in enumerate(SCRIPT_ORDER):
            if o == s:
                continue
            op = ">=" if j > i else ">"
            parts.append(f"c_{s} {op} c_{o}")
        conds.append(f"WHEN {' AND '.join(parts)} THEN '{s}'")
    counts_sel = ",\n         ".join(
        f"CAST({expr} AS BIGINT) AS c_{s}" for s, expr in cnt.items()
    )
    total = " + ".join(f"c_{s}" for s in SCRIPT_ORDER)
    return f"""
WITH planted AS (
  SELECT doc_id, CASE {case_plant} ELSE text END AS t FROM documents
), counted AS (
  SELECT doc_id,
         {counts_sel}
  FROM planted
), dom AS (
  SELECT doc_id,
         CASE {' '.join(conds)} ELSE 'none' END AS script,
         greatest({', '.join('c_' + s for s in SCRIPT_ORDER)}) AS dom_n,
         {total} AS tot
  FROM counted
)
SELECT script, count(*) AS n_docs,
       CAST(sum(CAST(round(dom_n * 1000000.0 / tot) AS BIGINT)) AS BIGINT)
         AS ratio_micros_sum
FROM dom GROUP BY script ORDER BY script
"""


register(QuerySpec(
    "text_script_profile", text_script_profile, _script_profile_sql(),
    "Unicode script composition (codegen range counting, planted "
    "multi-script corpus, exact integer micro-ratios)",
))
