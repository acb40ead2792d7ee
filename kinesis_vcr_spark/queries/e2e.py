"""The composed end-to-end LLM-prep driver query (r07 verdict item 5):
URL dedup → HTML extract → NFC → langid/quality filter → exact + near
dedup → decontamination → deterministic split, every document labeled
with the stage that removed it.

The fixture corpus is plain text, so the crawl shape is injected
deterministically (the repo's inject-then-process discipline, same as
``url_canonical_dedup`` / ``html_extract_stats``): every doc gets one
URL whose raw spelling varies by ``doc_id % 4`` (docs with
``doc_id % 7 == 1`` share the previous doc's page — the URL-dup
population) and an HTML wrap chosen by ``length(text) % 4`` — keyed on
the TEXT, not the id, so the fixture's planted exact-duplicate texts
always receive identical wraps and the exact-dedup stage stays
non-vacuous. Wrap variant 0 plants a DECOMPOSED ``e`` + combining
acute so the NFC stage provably rewrites bytes.

Oracle discipline: every sub-expression the Spark side evaluates is
either GENERATED into the SQL from the same source of truth
(``html_to_text_sql`` from HTML_STEPS, ``canonicalize_url_sql`` from
CANON_STEPS, the langid CASE from STOPWORDS/LANGS, the quality formula
from ``_quality_sql_expr``) or is the already-parity-proven ticket
md5 scheme — the oracle recomputes the ENTIRE pipeline relationally,
including brute-force Jaccard pairs and recursive-CTE components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.functions.text import CONTROL_CHARS, LANGS, STOPWORDS
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

E2E_SEED = "e2e"
E2E_BENCH_MOD = 97
E2E_J = 0.6
E2E_Q = 0.6
E2E_N = 5  # decontam word-n-gram size


def _injected(docs: DataFrame) -> DataFrame:
    """(doc_id, source, url, html) — the deterministic crawl shape."""
    page = (
        F.when(F.pmod("doc_id", F.lit(7)) == 1, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
        .cast("string")
    )
    v = F.pmod("doc_id", F.lit(4))
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://site"), page, F.lit(".com/Article"), page))
        .when(v == 1, F.concat(
            F.lit("http://www.site"), page, F.lit(".com/Article"), page,
            F.lit("/")))
        .when(v == 2, F.concat(
            F.lit("https://SITE"), page, F.lit(".com:443/Article"), page,
            F.lit("?utm_source=feed#sec")))
        .otherwise(F.concat(
            F.lit("http://site"), page, F.lit(".com:80/Article"), page,
            F.lit("?fbclid=abc")))
    )
    hv = F.pmod(F.length("text"), F.lit(4))
    t = F.col("text")
    html = (
        F.when(hv == 0, F.concat(
            F.lit("<html><body><p>"), t,
            F.lit(" cafe\u0301</p></body></html>")))
        .when(hv == 1, F.concat(
            F.lit("<script>var x = 1 < 2;</script>"
                  "<style>p {color:red}</style><p>"), t,
            F.lit(" &amp; more &lt;here&gt;</p>")))
        .when(hv == 2, F.concat(
            F.lit('<div><a href="/">Home</a> | <a href="/a">About us</a>'
                  "<p>"), t, F.lit('</p><a href="/c">Contact</a></div>')))
        .otherwise(F.concat(
            F.lit("<!-- header --><h1>Title &quot;h&quot;</h1>"), t,
            F.lit("<br>tail &#39;line&#39; &nbsp;end")))
    )
    return docs.select(
        "doc_id", "source", url.alias("url"), html.alias("html")
    )


def llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, status, split) doc counts of the full pipeline
    (:func:`kinesis_vcr_spark.operators.pipeline.llm_prep_corpus`) over
    the injected crawl; the benchmark eval set is every 97th doc, in
    the same crawl shape."""
    from kinesis_vcr_spark.operators.pipeline import llm_prep_corpus

    injected = _injected(load_table(spark, sf_dir, "documents"))
    bench = injected.where(
        F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0
    ).select("doc_id", "html")
    out = llm_prep_corpus(
        injected, bench,
        quality_threshold=E2E_Q, jaccard_threshold=E2E_J,
        decontam_n=E2E_N, split_seed=E2E_SEED,
    )
    return (
        out.groupBy("source", "status", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "status", "split")
    )


def _langid_case_sql(col: str) -> str:
    """The predicted-lang CASE generated from LANGS/STOPWORDS — same
    tie-break as functions.text.predicted_lang (first alphabetical
    language wins)."""

    def hits(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            f"len(list_intersect(list_distinct(string_split({col}, ' ')), "
            f"[{words}]))"
        )

    h = {lang: f"h_{lang}" for lang in LANGS}
    defs = ", ".join(f"{hits(lang)} AS {h[lang]}" for lang in LANGS)
    gr = f"greatest({', '.join(h.values())})"
    whens = " ".join(
        f"WHEN {h[lang]} = {gr} THEN '{lang}'" for lang in LANGS[:-1]
    )
    return defs, f"CASE {whens} ELSE '{LANGS[-1]}' END"


def _e2e_sql() -> str:
    from kinesis_vcr_spark.functions.html import html_to_text_sql
    from kinesis_vcr_spark.operators.urldedup import canonicalize_url_sql
    from kinesis_vcr_spark.operators.sampling import ticket_threshold
    from kinesis_vcr_spark.queries.dedup import _quality_sql_expr
    from kinesis_vcr_spark.queries.llmprep import _ticket_sql

    url_case = """CASE doc_id % 4
      WHEN 0 THEN 'https://site' || pg || '.com/Article' || pg
      WHEN 1 THEN 'http://www.site' || pg || '.com/Article' || pg || '/'
      WHEN 2 THEN 'https://SITE' || pg || '.com:443/Article' || pg
                  || '?utm_source=feed#sec'
      ELSE 'http://site' || pg || '.com:80/Article' || pg || '?fbclid=abc'
    END"""
    html_case = """CASE length(text) % 4
      WHEN 0 THEN '<html><body><p>' || text || ' cafe' || chr(769)
                  || '</p></body></html>'
      WHEN 1 THEN '<script>var x = 1 < 2;</script><style>p {color:red}</style><p>'
                  || text || ' &amp; more &lt;here&gt;</p>'
      WHEN 2 THEN '<div><a href="/">Home</a> | <a href="/a">About us</a><p>'
                  || text || '</p><a href="/c">Contact</a></div>'
      ELSE '<!-- header --><h1>Title &quot;h&quot;</h1>' || text
           || '<br>tail &#39;line&#39; &nbsp;end'
    END"""
    txt = (
        f"regexp_replace(nfc_normalize({html_to_text_sql('html')}), "
        f"'{CONTROL_CHARS}', '', 'g')"
    )
    hit_defs, lang_case = _langid_case_sql("txt")
    q = _quality_sql_expr("txt")
    n1 = E2E_N - 1
    return f"""
WITH RECURSIVE injected AS (
  SELECT doc_id, source,
         {url_case} AS url,
         {html_case} AS html
  FROM (SELECT *, CAST(CASE WHEN doc_id % 7 = 1 THEN doc_id - 1
                            ELSE doc_id END AS VARCHAR) AS pg
        FROM documents)
), extracted AS (
  SELECT doc_id, source,
         {txt} AS txt,
         {canonicalize_url_sql('url')} AS canon_url,
         (doc_id IS NOT NULL AND url IS NOT NULL AND html IS NOT NULL)
           AS io_ok
  FROM injected
), url_w AS (
  -- invalid rows (NULL id/url/html/text) never win a URL group and
  -- never enter the pipeline (mirrors llm_prep_corpus's `valid`)
  SELECT *, (io_ok AND txt IS NOT NULL) AS valid,
         min(CASE WHEN io_ok AND txt IS NOT NULL THEN doc_id END)
           OVER (PARTITION BY canon_url) AS url_winner
  FROM extracted
), scored AS (
  SELECT doc_id, source, txt, valid, url_winner, {hit_defs},
         {q} AS q
  FROM url_w
), pred AS (
  SELECT *, {lang_case} AS pred_lang FROM scored
), s1 AS (
  SELECT doc_id, txt FROM pred
  WHERE valid AND doc_id = url_winner AND pred_lang = 'en'
        AND q >= {E2E_Q}
), exact_w AS (
  SELECT doc_id, txt, min(doc_id) OVER (PARTITION BY txt) AS exact_winner
  FROM s1
), ek AS (
  SELECT doc_id, txt FROM exact_w WHERE doc_id = exact_winner
), toks AS (
  SELECT doc_id, string_split(txt, ' ') AS t FROM ek
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingles
  FROM toks
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= {E2E_J}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS node FROM edges
), reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
), near_drop AS (
  SELECT node AS doc_id FROM (
    SELECT node, min(lbl) AS component FROM reach GROUP BY node
  ) WHERE node <> component
), s2 AS (
  SELECT doc_id, txt FROM ek
  WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
), bench_grams AS (
  SELECT DISTINCT unnest(
      list_distinct(list_transform(
          range(1, greatest(len(string_split(txt, ' ')) - {n1}, 1) + 1),
          i -> array_to_string(
              list_slice(string_split(txt, ' '), i, i + {n1}), ' '))))
    AS gram
  FROM extracted WHERE doc_id % {E2E_BENCH_MOD} = 0
), dg AS (
  SELECT doc_id, unnest(
      list_distinct(list_transform(
          range(1, greatest(len(string_split(txt, ' ')) - {n1}, 1) + 1),
          i -> array_to_string(
              list_slice(string_split(txt, ' '), i, i + {n1}), ' '))))
    AS gram
  FROM s2
), contam AS (
  SELECT DISTINCT d.doc_id
  FROM dg d JOIN bench_grams b USING (gram)
), labeled AS (
  SELECT p.source,
         CASE WHEN NOT p.valid THEN 'dropped_invalid'
              WHEN p.doc_id <> p.url_winner THEN 'dropped_url_dup'
              WHEN p.pred_lang <> 'en' THEN 'dropped_lang'
              WHEN p.q < {E2E_Q} THEN 'dropped_quality'
              WHEN p.doc_id <> ew.exact_winner THEN 'dropped_exact'
              WHEN nd.doc_id IS NOT NULL THEN 'dropped_near_dup'
              WHEN c.doc_id IS NOT NULL THEN 'dropped_contaminated'
              ELSE 'kept' END AS status,
         CASE WHEN p.valid AND p.doc_id = p.url_winner
                   AND p.pred_lang = 'en'
                   AND p.q >= {E2E_Q} AND p.doc_id = ew.exact_winner
                   AND nd.doc_id IS NULL AND c.doc_id IS NULL
              THEN CASE WHEN {_ticket_sql(E2E_SEED, "p.doc_id")}
                            < '{ticket_threshold(0.8)}' THEN 'train'
                        WHEN {_ticket_sql(E2E_SEED, "p.doc_id")}
                            < '{ticket_threshold(0.9)}' THEN 'val'
                        ELSE 'test' END
              ELSE '-' END AS split
  FROM pred p
  LEFT JOIN exact_w ew ON ew.doc_id = p.doc_id
  LEFT JOIN near_drop nd ON nd.doc_id = p.doc_id
  LEFT JOIN contam c ON c.doc_id = p.doc_id
)
SELECT source, status, split, count(*) AS n_docs
FROM labeled GROUP BY source, status, split
ORDER BY source, status, split
"""


register(QuerySpec(
    "llm_prep_pipeline", llm_prep_pipeline, _e2e_sql(),
    "end-to-end LLM-prep: URL dedup → HTML extract → NFC → langid/"
    "quality → exact+near dedup → decontam → split, stage-labeled",
))
