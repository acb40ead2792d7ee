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

from kinesis_vcr_spark.operators.blockfilter import flag_blocked_single_pass
from kinesis_vcr_spark.operators.lmscore import MICRO, score_documents_lm
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table, widen_small_scan

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
    RefinedWeb URL filtering shapes). Uses the single-pass HOF variant
    with ``carry_cols`` (VERDICT r05 item 2: the flag_blocked +
    verdict-join shape scanned documents twice) — ONE corpus scan, zero
    shuffles before the tiny per-source agg."""
    docs = _injected_docs(load_table(spark, sf_dir, "documents"))
    verdict = flag_blocked_single_pass(
        docs, "doc_id", "txt",
        bad_terms=BAD_TERMS, bad_domains=BAD_DOMAINS,
        carry_cols=("source",),
    )
    return (
        verdict.groupBy("source")
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


# ---------------------------------------------------------------------------
# SemDeDup: embedding-cluster semantic dedup (planted, hash-independent)
# ---------------------------------------------------------------------------

SEM_THRESHOLD = 0.95


def semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdict on the planted-twin corpus: every 10th vector
    gets an identical twin at ``vec_id + 1e6`` (the
    ``dedup_embedding_cosine_planted`` fixture), and the clustered
    pipeline must drop exactly the twins, keeping the originals as
    ε-ball representatives. The output is clustering-INDEPENDENT —
    identical vectors always co-cluster, and the raw fixture tops out
    at cosine ≈ 0.51 ≪ 0.95 — so a brute-force relational oracle
    reproduces it exactly even though k-means itself isn't
    SQL-expressible."""
    from kinesis_vcr_spark.operators.semdedup import semantic_dedup
    from kinesis_vcr_spark.queries.dedup import PLANT_MOD, PLANT_OFFSET

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.where(F.col("vec_id") % PLANT_MOD == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET)
    )
    corpus = emb.unionByName(twins).select("vec_id", "embedding")
    verdict = semantic_dedup(
        corpus, "vec_id", "embedding",
        threshold=SEM_THRESHOLD, k_clusters=None, refine_iterations=1,
        # adaptive k (max(8, n/256)) keeps intra-cluster work linear in
        # n; the verdict is k-independent because only identical twins
        # reach 0.95 and identical vectors always co-cluster.
        # no member cap: the oracle brute-forces ALL pairs, so any
        # capped-away cluster would silently diverge at larger sf
        # (adaptive k keeps clusters ~256 members, far under danger)
        max_cluster_members=None,
    )
    return (
        verdict.where(~F.col("keep"))
        .select("vec_id", F.col("group").alias("kept_as"))
        .orderBy("vec_id")
    )


def _semdedup_sql() -> str:
    from kinesis_vcr_spark.queries.dedup import PLANT_MOD, PLANT_OFFSET

    return f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % {PLANT_MOD} = 0
), v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM corpus
), n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM v
), u AS (
  SELECT vec_id, list_transform(e, x -> x / nrm) AS un FROM n
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM u a JOIN u b ON a.vec_id < b.vec_id
  WHERE list_reduce(list_transform(range(1, 65),
            i -> a.un[i] * b.un[i]), (x, y) -> x + y) >= {SEM_THRESHOLD}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS node FROM edges
), reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node, min(lbl) AS kept_as FROM reach GROUP BY node
)
SELECT node AS vec_id, kept_as FROM comp
WHERE node <> kept_as ORDER BY vec_id
"""


register(QuerySpec("semantic_dedup_planted", semantic_dedup_planted,
                   _semdedup_sql(),
                   "SemDeDup: k-means clusters → intra-cluster ε-balls → "
                   "planted twins dropped, originals kept"))


# ---------------------------------------------------------------------------
# sliding-window document chunking (embedding/RAG prep)
# ---------------------------------------------------------------------------

CHUNK_WINDOW = 32
CHUNK_OVERLAP = 8


def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chunking audit for 32-token windows with 8-token
    overlap: exact integer chunk/token accounting (operators/
    chunking.py — the zero-shuffle 1→N projection before embedding)."""
    from kinesis_vcr_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, "doc_id", "text",
        window_tokens=CHUNK_WINDOW, overlap_tokens=CHUNK_OVERLAP,
    )
    return (
        docs.select("doc_id", "source")
        .join(chunks, "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("total_chunk_tokens"),
            F.max("n_chunk_tokens").alias("max_chunk_tokens"),
        )
        .orderBy("source")
    )


_STRIDE = CHUNK_WINDOW - CHUNK_OVERLAP

CHUNKS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS t,
         greatest(CAST(ceil(greatest(len(string_split(text, ' '))
                  - {CHUNK_OVERLAP}, 1) / {_STRIDE}.0) AS INT), 1) AS nc
  FROM documents
), c AS (
  SELECT doc_id, source,
         len(list_slice(t, i * {_STRIDE} + 1,
                        i * {_STRIDE} + {CHUNK_WINDOW})) AS n_tok
  FROM d, unnest(range(0, nc)) u(i)
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tok) AS BIGINT) AS total_chunk_tokens,
       CAST(max(n_tok) AS BIGINT) AS max_chunk_tokens
FROM c GROUP BY source ORDER BY source
"""


register(QuerySpec("doc_chunks_overlap", doc_chunks_overlap, CHUNKS_SQL,
                   "sliding-window chunking audit: 32-token windows, "
                   "8-token overlap, exact token accounting"))


# ---------------------------------------------------------------------------
# Unicode canonicalization (NFC + control strip), injected non-vacuous
# ---------------------------------------------------------------------------

NFC_MOD = 4      # every 4th doc: decomposed e + U+0301 (NFC composes to e-acute)
CTRL_MOD = 6     # every 6th doc: BEL control char (stripped)


def text_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization audit: plant DECOMPOSED combining sequences and
    control characters, run NFC + control-strip
    (functions/text.py::canonicalize_text), report per-source how many
    documents changed plus exact codepoint counts before/after (both
    engines' length() counts codepoints, so the audit is exact: the
    combining pair collapses 2 -> 1, the control char 1 -> 0)."""
    from kinesis_vcr_spark.functions.text import canonicalize_text

    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(NFC_MOD)) == 0,
                F.lit(" nfc:e\u0301"),  # decomposed: e + combining acute
            ).otherwise(F.lit("")),
            F.when(
                F.pmod("doc_id", F.lit(CTRL_MOD)) == 0, F.lit("\u0007x")  # BEL + x
            ).otherwise(F.lit("")),
        ).alias("txt"),
    )
    out = injected.select(
        "source",
        F.length("txt").alias("len_before"),
        F.length(canonicalize_text(F.col("txt"))).alias("len_after"),
    )
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("len_before") != F.col("len_after")).cast("long"))
            .alias("n_changed"),
            F.sum("len_before").alias("chars_before"),
            F.sum("len_after").alias("chars_after"),
        )
        .orderBy("source")
    )


NFC_SQL = rf"""
WITH injected AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % {NFC_MOD} = 0
                 THEN ' nfc:e' || chr(769) ELSE '' END
         || CASE WHEN doc_id % {CTRL_MOD} = 0
                 THEN chr(7) || 'x' ELSE '' END AS txt
  FROM documents
), canon AS (
  SELECT source, length(txt) AS len_before,
         length(regexp_replace(nfc_normalize(txt),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g'))
           AS len_after
  FROM injected
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN len_before <> len_after THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changed,
       CAST(sum(len_before) AS BIGINT) AS chars_before,
       CAST(sum(len_after) AS BIGINT) AS chars_after
FROM canon GROUP BY source ORDER BY source
"""


register(QuerySpec("text_unicode_nfc", text_unicode_nfc, NFC_SQL,
                   "NFC canonicalization + control strip: injected "
                   "decomposed/control chars, exact codepoint audit"))


# ---------------------------------------------------------------------------
# weighted corpus mixing (Pile/DoReMi epoch weights)
# ---------------------------------------------------------------------------

MIX_WEIGHTS = {"src0": 2.5, "src1": 0.25, "src2": 0.0}
MIX_SEED = "mix"


def corpus_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized mixture audit: src0 at 2.5 epochs (2 full copies +
    ticket-half), src1 downsampled to 0.25, src2 dropped, everything
    else at 1.0 — per-source input vs output row counts, exact. The
    operator really runs (posexplode fan-out); the oracle recomputes
    the copy arithmetic from the same md5 tickets."""
    from kinesis_vcr_spark.operators.mixing import weighted_mix

    docs = load_table(spark, sf_dir, "documents")
    mixed = weighted_mix(
        docs, "source", ["doc_id"], MIX_WEIGHTS, seed=MIX_SEED
    )
    out_counts = mixed.groupBy("source").agg(
        F.count("*").alias("n_rows_out")
    )
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs_in"))
        .join(out_counts, "source", "left")
        .select(
            "source",
            "n_docs_in",
            F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
        )
        .orderBy("source")
    )


def _mix_sql() -> str:
    import math

    from kinesis_vcr_spark.operators.sampling import ticket_threshold

    base = " ".join(
        f"WHEN source = '{s}' THEN {math.floor(w)}"
        for s, w in sorted(MIX_WEIGHTS.items())
    )
    cut = " ".join(
        f"WHEN source = '{s}' THEN '{ticket_threshold(w - math.floor(w))}'"
        for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH t AS (
  SELECT source, doc_id,
         substr(md5(concat_ws(chr(31), '{MIX_SEED}',
                CAST(doc_id AS VARCHAR))), 1, 8) AS tk
  FROM documents
), c AS (
  SELECT source,
         CASE {base} ELSE 1 END
         + CASE WHEN tk < CASE {cut} ELSE '00000000' END
                THEN 1 ELSE 0 END AS n
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_in,
       CAST(sum(n) AS BIGINT) AS n_rows_out
FROM c GROUP BY source ORDER BY source
"""


register(QuerySpec("corpus_mix_epochs", corpus_mix_epochs, _mix_sql(),
                   "Pile/DoReMi-style epoch-weighted mixing: exact "
                   "per-source copy accounting from hash tickets"))


# ---------------------------------------------------------------------------
# KMV corpus-overlap sketch (cross-corpus contamination estimate)
# ---------------------------------------------------------------------------

KMV_QUERY_K = 1024


def corpus_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level overlap between two halves of the corpus (doc_id
    parity) over word-3-shingle sets, via deterministic bottom-k (KMV)
    sketches: per-side distinct-shingle estimates plus the KMV Jaccard
    of the union bottom-k. The sketch is vocabulary-sized state built
    in one two-phase distinct — the "how much does corpus A overlap
    corpus B" answer that at 100 TB cannot afford an exact set
    intersection; everything is md5-deterministic, so DuckDB rebuilds
    the identical sketch and estimates."""
    from kinesis_vcr_spark.operators.dedup import word_shingles
    from kinesis_vcr_spark.operators.sketch import (
        kmv_distinct,
        kmv_jaccard,
        kmv_sketch,
    )

    # shingle+md5 over every token trigram — widen the single-split
    # fixture scan (A/B: 4.3 s -> 1.8 s at sf0.1)
    docs = widen_small_scan(load_table(spark, sf_dir, "documents"))
    shingled = docs.select(
        F.pmod("doc_id", F.lit(2)).alias("side"),
        F.explode(word_shingles(F.col("text"), 3)).alias("s"),
    )
    sk = kmv_sketch(shingled, ["side"], "s", k=KMV_QUERY_K)
    a = sk.where(F.col("side") == 0).select(F.col("hs").alias("a_hs"))
    b = sk.where(F.col("side") == 1).select(F.col("hs").alias("b_hs"))
    return a.crossJoin(b).select(
        kmv_distinct(F.col("a_hs"), KMV_QUERY_K).alias("distinct_a"),
        kmv_distinct(F.col("b_hs"), KMV_QUERY_K).alias("distinct_b"),
        kmv_jaccard(F.col("a_hs"), F.col("b_hs"), KMV_QUERY_K).alias(
            "jaccard"
        ),
    )


_KMV_SPACE_60 = 16**15


def _kmv_est_sql(hs: str) -> str:
    return f"""CASE WHEN len({hs}) < {KMV_QUERY_K}
         THEN CAST(len({hs}) AS DOUBLE)
         ELSE round({KMV_QUERY_K - 1}.0
              / (CAST('0x' || {hs}[len({hs})] AS UBIGINT)
                 / {_KMV_SPACE_60}.0), 4) END"""


KMV_SQL = f"""
WITH toks AS (
  -- \\s+ regexp split == Spark tokens()'s F.split(text, '\\s+'):
  -- parity must not depend on fixture text being single-spaced
  -- (ADVICE r03). Both engines keep leading/trailing empty tokens.
  SELECT doc_id % 2 AS side, regexp_split_to_array(text, '\\s+') AS t
  FROM documents
), sh AS (
  SELECT side, array_to_string(list_slice(t, i, i + 2), ' ') AS s
  FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) u(i)
), h AS (
  SELECT DISTINCT side, substr(md5(s), 1, 15) AS h FROM sh
), bk AS (
  SELECT side, list_slice(list_sort(list(h)), 1, {KMV_QUERY_K}) AS hs
  FROM h GROUP BY side
), ab AS (
  SELECT (SELECT hs FROM bk WHERE side = 0) AS a_hs,
         (SELECT hs FROM bk WHERE side = 1) AS b_hs
), j AS (
  SELECT a_hs, b_hs,
         list_slice(list_sort(list_distinct(a_hs || b_hs)), 1,
                    least({KMV_QUERY_K},
                          len(list_distinct(a_hs || b_hs)))) AS ub
  FROM ab
)
SELECT {_kmv_est_sql("a_hs")} AS distinct_a,
       {_kmv_est_sql("b_hs")} AS distinct_b,
       round(CAST(len(list_filter(ub,
                 x -> list_contains(a_hs, x) AND list_contains(b_hs, x)))
             AS DOUBLE) / len(ub), 4) AS jaccard
FROM j
"""


register(QuerySpec("corpus_overlap_kmv", corpus_overlap_kmv, KMV_SQL,
                   "KMV bottom-k corpus-overlap sketch: per-side distinct "
                   "estimates + union-bottom-k Jaccard, fully deterministic"))


# ---------------------------------------------------------------------------
# table profiling (ANALYZE-style data-quality audit)
# ---------------------------------------------------------------------------

PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props", "ts_ns")


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table in ONE aggregation pass:
    null counts, exact distincts (Spark plans the multi-distinct via
    Expand — still one scan), 6-dp numeric ranges, string ranges
    (operators/profile.py; at 100 TB flip exact_distinct=False for
    HLL)."""
    from kinesis_vcr_spark.operators.profile import profile_table

    ev = load_table(spark, sf_dir, "events")
    return profile_table(ev, list(PROFILE_COLS)).orderBy("col_name")


def _profile_sql() -> str:
    numeric = {"event_id", "user_id", "value", "ts_ns"}
    parts = []
    for c in PROFILE_COLS:
        expr = "epoch_ns(ts)" if c == "ts_ns" else c
        if c in numeric:
            mn = f"round(CAST(min({expr}) AS DOUBLE), 6)"
            mx = f"round(CAST(max({expr}) AS DOUBLE), 6)"
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"min({expr})"
            xs = f"max({expr})"
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({expr}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {ms} AS min_str, {xs} AS max_str
FROM events""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


register(QuerySpec("profile_events", profile_events, _profile_sql(),
                   "one-pass ANALYZE-style column profile: nulls, exact "
                   "distincts, typed ranges"))


def profile_events_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AT-SCALE branch of the profiler (VERDICT r03 "watch":
    exact multi-distinct Expand is scan-heavy): same one-pass shape
    with ``approx_count_distinct`` — HLL partials merge map-side, no
    Expand multiplication of the scan. Registered rows-only (HLL
    estimates are engine-specific by construction); the exact twin
    ``profile_events`` carries the value oracle, and this keeps the
    scale branch benchmarked + driver-smoke-checked."""
    from kinesis_vcr_spark.operators.profile import profile_table

    ev = load_table(spark, sf_dir, "events")
    return profile_table(
        ev, list(PROFILE_COLS), exact_distinct=False
    ).orderBy("col_name")


register(QuerySpec("profile_events_approx", profile_events_approx, None,
                   "profiler scale branch: HLL distincts, no Expand "
                   "(rows-only: estimates are engine-specific)"))


#: HLL audit tolerance: Spark's approx_count_distinct default rsd is
#: 0.05; 3σ of relative error. The estimate is deterministic for fixed
#: data (fixed hash, no sampling), so the within-band flag is a stable,
#: oracle-checkable value — this is the driver-grade companion the
#: rows-only profile_events_approx never had (VERDICT r06 item 2).
HLL_AUDIT_TOL = 0.15


def profile_events_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-bounds audit of the HLL profiler branch: per profiled
    column, the exact distinct count plus a flag that the
    ``approx_count_distinct`` estimate lands within ±15 % of it. The
    oracle recomputes the exact counts and expects every flag = 1, so a
    silent HLL regression (wrong hash width, broken partial merge,
    column mix-up) turns the driver row red — the estimate itself stays
    engine-specific and is deliberately NOT in the output."""
    from kinesis_vcr_spark.operators.profile import profile_table

    ev = load_table(spark, sf_dir, "events")
    exact = profile_table(ev, list(PROFILE_COLS)).select(
        "col_name", "n_distinct"
    )
    approx = profile_table(ev, list(PROFILE_COLS), exact_distinct=False).select(
        "col_name", F.col("n_distinct").alias("__n_approx")
    )
    return (
        exact.join(approx, "col_name")
        .select(
            "col_name",
            "n_distinct",
            (
                F.abs(
                    F.col("__n_approx").cast("double")
                    / F.col("n_distinct").cast("double")
                    - 1.0
                )
                <= HLL_AUDIT_TOL
            )
            .cast("long")
            .alias("within_tol"),
        )
        .orderBy("col_name")
    )


def _hll_audit_sql() -> str:
    parts = []
    for c in PROFILE_COLS:
        expr = "epoch_ns(ts)" if c == "ts_ns" else c
        parts.append(
            f"SELECT '{c}' AS col_name,"
            f" CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,"
            f" CAST(1 AS BIGINT) AS within_tol FROM events"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


register(QuerySpec("profile_events_hll_audit", profile_events_hll_audit,
                   _hll_audit_sql(),
                   "HLL profiler audit: exact distincts + in-tolerance "
                   "flags (driver-grade check for the approx branch)"))


# ---------------------------------------------------------------------------
# corpus snapshot diff (generation-gate audit)
# ---------------------------------------------------------------------------

DIFF_CHANGE_MOD = 9    # every 9th doc: text edited in the new snapshot
DIFF_REMOVE_MOD = 13   # every 13th (non-edited) doc: dropped
DIFF_ADD_OFFSET = 5_000_000
DIFF_ADD_MOD = 17      # every 17th doc: cloned in as a brand-new id


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-snapshot delta audit (operators/diffing.py): the
    'new' generation deterministically edits every 9th document, drops
    every 13th, and adds clones at ``doc_id + 5e6`` for every 17th —
    per-status document counts must account for every key exactly
    once. One co-partitioned full-outer join on 16-byte digests."""
    from kinesis_vcr_spark.operators.diffing import corpus_diff, diff_summary

    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text")
    changed = F.when(
        F.pmod("doc_id", F.lit(DIFF_CHANGE_MOD)) == 0,
        F.concat(F.col("text"), F.lit(" [edited]")),
    ).otherwise(F.col("text"))
    base_new = (
        old.where(
            (F.pmod("doc_id", F.lit(DIFF_REMOVE_MOD)) != 0)
            | (F.pmod("doc_id", F.lit(DIFF_CHANGE_MOD)) == 0)
        )
        .select("doc_id", changed.alias("text"))
    )
    additions = old.where(
        F.pmod("doc_id", F.lit(DIFF_ADD_MOD)) == 0
    ).select(
        (F.col("doc_id") + F.lit(DIFF_ADD_OFFSET)).alias("doc_id"), "text"
    )
    new = base_new.unionByName(additions)
    return (
        diff_summary(corpus_diff(old, new, ["doc_id"], ["text"]))
        .orderBy("status")
    )


DIFF_SQL = f"""
WITH old AS (
  SELECT doc_id, text FROM documents
), base_new AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_CHANGE_MOD} = 0
              THEN text || ' [edited]' ELSE text END AS text
  FROM old
  WHERE doc_id % {DIFF_REMOVE_MOD} <> 0 OR doc_id % {DIFF_CHANGE_MOD} = 0
), new AS (
  SELECT * FROM base_new
  UNION ALL
  SELECT doc_id + {DIFF_ADD_OFFSET} AS doc_id, text
  FROM old WHERE doc_id % {DIFF_ADD_MOD} = 0
), diff AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text = n.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT status, CAST(count(*) AS BIGINT) AS n_docs
FROM diff GROUP BY status ORDER BY status
"""


register(QuerySpec("corpus_snapshot_diff", corpus_snapshot_diff, DIFF_SQL,
                   "generation-gate diff: added/removed/changed/unchanged "
                   "accounting across deterministic snapshot edits"))


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring (round 4: one order up from the unigram)
# ---------------------------------------------------------------------------


def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interpolated-bigram LM profile: self-trained
    λ-bigram/(1-λ)-add-1-unigram mixture, exact integer micro-nat
    totals (operators/lmscore.py:bigram_nll_table); mean from exact
    sums, min/max over per-doc ratios — order-independent, so the
    DuckDB rebuild matches digit-for-digit."""
    from kinesis_vcr_spark.operators.lmscore import score_documents_bigram

    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents_bigram(docs, "doc_id", "text")
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


def _bigram_sql() -> str:
    # the float literals MUST be the reprs of the exact Python doubles
    # the Spark side uses: 1.0 - 0.7 is 0.30000000000000004, NOT the
    # nearest-double of 0.3 — emitting '0.3' would silently diverge.
    from kinesis_vcr_spark.operators.lmscore import LAMBDA_BIGRAM

    lam = repr(float(LAMBDA_BIGRAM))
    one_minus = repr(1.0 - float(LAMBDA_BIGRAM))
    return f"""
WITH dt AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             t -> length(t) > 0) AS toks
  FROM documents
), idx AS (
  SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM dt
), pairs AS (
  SELECT doc_id,
         CASE WHEN i = 0 THEN chr(2) ELSE toks[i] END AS prev,
         toks[i + 1] AS token
  FROM idx
), c_pw AS (
  SELECT prev, token, CAST(count(*) AS BIGINT) AS c_pw
  FROM pairs GROUP BY prev, token
), c_p AS (
  SELECT prev, CAST(sum(c_pw) AS BIGINT) AS c_p FROM c_pw GROUP BY prev
), uni AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c_w FROM pairs GROUP BY token
), tot AS (
  SELECT CAST(sum(c_w) AS BIGINT) AS n_total, count(*) AS v_size FROM uni
), nll AS (
  SELECT prev, token,
         -CAST(round(ln(CAST({lam} AS DOUBLE) * c_pw / c_p
                        + CAST({one_minus} AS DOUBLE) * (c_w + 1.0)
                          / (n_total + 1.0 * v_size)) * {MICRO})
               AS BIGINT) AS nll_micro
  FROM c_pw JOIN c_p USING (prev) JOIN uni USING (token), tot
), doc AS (
  SELECT p.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(nll_micro) AS BIGINT) AS nll_total
  FROM pairs p JOIN nll USING (prev, token) GROUP BY p.doc_id
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


register(QuerySpec("lm_bigram_score", lm_bigram_score, _bigram_sql(),
                   "interpolated bigram-LM scoring: λ·MLE-bigram + "
                   "(1-λ)·add-1-unigram mixture, exact micro-nat NLL "
                   "totals, per-source profile"))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (round 4: the broadcast scale path)
# ---------------------------------------------------------------------------

BLOOM_M = 2**12  # small on purpose: false positives become observable
BLOOM_N = 5      # word 5-grams, same key family as decontam_ngram_overlap
BLOOM_H = 4
BLOOM_BENCH_MOD = 97


def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination screen (operators/bloom.py): build the
    filter over the planted benchmark's distinct tokens (doc_id %
    97 == 0), probe every doc's distinct word 5-grams, report per-doc probe
    and flag counts. The filter is deterministic integer arithmetic end
    to end, so DuckDB rebuilds the BIT-IDENTICAL word table and the
    flag counts — false positives included — match exactly. This is the
    100 TB shape of decontam_ngram_overlap: the corpus never shuffles
    (broadcast word table, map-side probe), at the price of a bounded
    FP rate; flagged docs re-check exactly, clean docs are clean."""
    from kinesis_vcr_spark.operators.bloom import bloom_build, bloom_probe

    from kinesis_vcr_spark.operators.dedup import (
        tokens, word_shingles_from_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    # single-space split on BOTH engines (not \\s+), so shingles agree
    # even if a fixture regeneration introduces double spaces (ADVICE
    # r03 on corpus_overlap_kmv); token array projected BEFORE the HOF
    # (see word_shingles_from_tokens on the interpreted-HOF trap)
    toks = docs.select(
        "doc_id", tokens("text", " ").alias("__toks")
    ).select(
        "doc_id",
        F.explode(
            word_shingles_from_tokens(F.col("__toks"), BLOOM_N)
        ).alias("token"),
    )
    bench = (
        toks.where(F.col("doc_id") % BLOOM_BENCH_MOD == 0)
        .select("token")
        .distinct()
    )
    bloom = bloom_build(bench, "token", BLOOM_M, BLOOM_H)
    probed = bloom_probe(toks, "token", bloom, BLOOM_M, BLOOM_H)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("maybe_member").cast("int")).alias("n_flagged"),
        )
        .orderBy("doc_id")
    )


def _bloom_sql() -> str:
    from kinesis_vcr_spark.operators.bloom import HASH_A, HASH_B, MERSENNE_P

    hashes = ", ".join(
        f"((x * {HASH_A[j]} + {HASH_B[j]}) % {MERSENNE_P}) % {BLOOM_M}"
        for j in range(BLOOM_H)
    )
    return f"""
WITH ta AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 4, 1) + 1),
             i -> array_to_string(list_slice(t, i, i + 4), ' '))))
           AS token
  FROM ta
), dig AS (
  SELECT doc_id, token,
         CAST('0x' || substr(md5(token), 1, 7) AS BIGINT) AS x
  FROM toks
), bench_pos AS (
  SELECT unnest([{hashes}]) AS pos
  FROM (SELECT DISTINCT x FROM dig WHERE doc_id % {BLOOM_BENCH_MOD} = 0)
), bits AS (
  SELECT pos // 32 AS widx,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS wbits
  FROM bench_pos GROUP BY widx
), probe AS (
  SELECT doc_id, token, unnest([{hashes}]) AS pos FROM dig
), perkey AS (
  SELECT p.doc_id, p.token,
         count(*) AS np,
         sum(CASE WHEN b.wbits IS NOT NULL
                   AND (b.wbits & (1::BIGINT
                                   << CAST(p.pos % 32 AS INTEGER))) <> 0
             THEN 1 ELSE 0 END) AS nh
  FROM probe p LEFT JOIN bits b ON p.pos // 32 = b.widx
  GROUP BY p.doc_id, p.token
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN nh = np THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM perkey GROUP BY doc_id ORDER BY doc_id
"""


register(QuerySpec("decontam_bloom", decontam_bloom, _bloom_sql(),
                   "Bloom-screen decontamination: bit-identical "
                   "cross-engine filter, broadcast probe, zero corpus "
                   "shuffle"))


# ---------------------------------------------------------------------------
# PMI collocations (round 4): adjacency pointwise mutual information
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by adjacency PMI: ``ln(c_xy·N / (c_x·c_y))``
    over in-document adjacent token pairs (BOS rows excluded — document
    starts aren't collocations), margins from the same pairs frame.
    The single ln per DISTINCT pair takes only integer arguments and is
    micro-fixed immediately (order-independent, engine-identical);
    pairs under PMI_MIN_COUNT are dropped before ranking so rare-pair
    noise (PMI's known failure mode) never reaches the top-k. Reuses
    operators/lmscore.py:bigram_pairs — one narrow shift-zip pass."""
    from kinesis_vcr_spark.operators.lmscore import BOS, bigram_pairs
    from kinesis_vcr_spark.operators.topk import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    pairs = bigram_pairs(docs, "doc_id", "text").where(
        F.col("prev") != F.lit(BOS)
    )
    c_xy = pairs.groupBy("prev", "token").agg(F.count("*").alias("c_xy"))
    c_x = c_xy.groupBy("prev").agg(F.sum("c_xy").alias("c_x"))
    c_y = c_xy.groupBy("token").agg(F.sum("c_xy").alias("c_y"))
    n = c_xy.agg(F.sum("c_xy").alias("n_pairs"))
    scored = (
        c_xy.where(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(c_x, "prev")
        .join(c_y, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "prev", "token", "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") * F.col("n_pairs")).cast("double")
                    / (F.col("c_x") * F.col("c_y"))
                )
                * 1000000
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    top = topk_per_group(
        scored.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("pmi_micro").desc(), F.col("prev"), F.col("token")],
        PMI_TOP_K,
    ).drop("__g")
    return top.select(
        "prev", "token", "c_xy", "pmi_micro",
        F.round(F.col("pmi_micro") / 1000000.0, 6).alias("pmi"),
    ).orderBy(F.col("pmi_micro").desc(), "prev", "token")


PMI_SQL = f"""
WITH dt AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             s -> length(s) > 0) AS t
  FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(len(t))) AS i FROM dt
), pairs AS (
  -- i >= 1 skips the document-start pair (no BOS in collocations)
  SELECT t[i] AS prev, t[i + 1] AS token FROM idx WHERE i >= 1
), c_xy AS (
  SELECT prev, token, CAST(count(*) AS BIGINT) AS c_xy
  FROM pairs GROUP BY prev, token
), c_x AS (
  SELECT prev, CAST(sum(c_xy) AS BIGINT) AS c_x FROM c_xy GROUP BY prev
), c_y AS (
  SELECT token, CAST(sum(c_xy) AS BIGINT) AS c_y FROM c_xy GROUP BY token
), n AS (
  SELECT CAST(sum(c_xy) AS BIGINT) AS n_pairs FROM c_xy
), scored AS (
  SELECT prev, token, c_xy,
         CAST(round(ln(CAST(c_xy * n_pairs AS DOUBLE) / (c_x * c_y))
                    * 1000000) AS BIGINT) AS pmi_micro
  FROM c_xy JOIN c_x USING (prev) JOIN c_y USING (token), n
  WHERE c_xy >= {PMI_MIN_COUNT}
)
SELECT prev, token, c_xy, pmi_micro,
       round(pmi_micro / 1000000.0, 6) AS pmi
FROM scored
ORDER BY pmi_micro DESC, prev, token
LIMIT {PMI_TOP_K}
"""


register(QuerySpec("token_pmi_collocations", token_pmi_collocations,
                   PMI_SQL,
                   "adjacency-PMI collocations: integer-arg ln micro-"
                   "fixed, min-count floor, global top-k"))


# ---------------------------------------------------------------------------
# blocked fuzzy join: edit-distance record linkage (operators/fuzzyjoin.py)
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2
FUZZY_AFFIX = 8
FUZZY_MUT_OFFSET = 1_000_000
FUZZY_BLOCK_CAP = 1000  # shared constant: Spark cap AND the oracle rule


def doc_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage on the planted-mutant corpus: every document gets
    a copy at ``doc_id + 1e6`` with character 5 replaced by '#' (one
    substitution → edit distance 1, breaking the prefix block but never
    the suffix block), and the blocked join must link each original to
    its mutant plus whatever natural (near-)duplicates fall within
    distance 2. The affix-blocking rule is the operator's CONTRACT
    (module docstring, operators/fuzzyjoin.py) and the oracle encodes
    the identical rule, so the check is exact — candidates, distances
    and all."""
    from kinesis_vcr_spark.operators.fuzzyjoin import edit_distance_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutants = docs.select(
        (F.col("doc_id") + FUZZY_MUT_OFFSET).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, 4)"),
            F.lit("#"),
            F.expr("substring(text, 6)"),
        ).alias("text"),
    )
    corpus = docs.unionByName(mutants)
    pairs = edit_distance_pairs(
        corpus, "doc_id", "text",
        max_dist=FUZZY_MAX_DIST, affix_len=FUZZY_AFFIX,
        # the cap is part of the CHECKED contract (ADVICE r05, resolved
        # r06): the oracle SQL encodes the identical over-cap-block
        # exclusion, so Spark and DuckDB drop exactly the same blocks
        # at every sf. The r06 first cut passed cap=None instead —
        # exact, but 33.9 s at sf1.0 (~20× per decade: the 31-word
        # fixture makes uncapped affix blocks quadratic); encoding the
        # cap keeps both exactness AND the bounded-work scale posture.
        block_member_cap=FUZZY_BLOCK_CAP,
    )
    return pairs.orderBy("id_a", "id_b")


FUZZY_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {FUZZY_MUT_OFFSET} AS doc_id,
         substr(text, 1, 4) || '#' || substr(text, 6) AS text
  FROM documents
), blocks AS (
  SELECT doc_id, 0 AS bpos, substr(text, 1, {FUZZY_AFFIX}) AS bkey FROM d
  UNION ALL
  SELECT doc_id, 1,
         substr(text, greatest(length(text) - {FUZZY_AFFIX - 1}, 1),
                {FUZZY_AFFIX})
  FROM d
), kept AS (
  -- the hot-block cap IS part of the operator contract: blocks with
  -- more than {FUZZY_BLOCK_CAP} members are dropped on BOTH engines
  -- (mirrors cap_group_size over the exploded block table)
  SELECT doc_id, bpos, bkey FROM (
    SELECT doc_id, bpos, bkey,
           count(*) OVER (PARTITION BY bpos, bkey) AS n
    FROM blocks
  ) WHERE n <= {FUZZY_BLOCK_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a
  JOIN kept b
    ON a.bpos = b.bpos AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(x.text, y.text) AS BIGINT) AS dist
FROM cand c
JOIN d x ON x.doc_id = c.id_a
JOIN d y ON y.doc_id = c.id_b
WHERE abs(length(x.text) - length(y.text)) <= {FUZZY_MAX_DIST}
  AND levenshtein(x.text, y.text) <= {FUZZY_MAX_DIST}
ORDER BY id_a, id_b
"""


register(QuerySpec("doc_fuzzy_pairs", doc_fuzzy_pairs, FUZZY_SQL,
                   "blocked fuzzy join: affix-blocked edit-distance "
                   "record linkage, planted single-substitution mutants"))


# ---------------------------------------------------------------------------
# exact all-pairs similarity join via prefix filtering (operators/setjoin.py)
# ---------------------------------------------------------------------------

ALLPAIRS_PCT = 50  # word-3-shingle Jaccard >= 0.50


def dedup_allpairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-recall near-dup audit: EVERY document pair with
    word-3-shingle Jaccard ≥ 0.50, via prefix filtering
    (AllPairs/PPJoin) — the guaranteed-complete counterpart to the
    probabilistic-recall MinHash-LSH path (``dedup_near_minhash``).
    Same shingle construction as ``corpus_overlap_kmv`` (\\s+ split,
    empties kept, parity-pinned against the oracle's list_slice
    shingles). All threshold arithmetic is integer (pct=50), so the
    qualifying set is bit-identical on both engines; the naive
    token-co-occurrence oracle pins that prefix filtering loses no
    pair."""
    from kinesis_vcr_spark.operators.dedup import (
        tokens,
        word_shingles_from_tokens,
    )
    from kinesis_vcr_spark.operators.setjoin import jaccard_join_exact

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", tokens("text").alias("__w")).select(
        "doc_id", word_shingles_from_tokens(F.col("__w"), 3).alias("sh")
    )
    return (
        jaccard_join_exact(sh, "doc_id", "sh", ALLPAIRS_PCT)
        .orderBy("id_a", "id_b")
    )


ALLPAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(text, '\\s+') AS t
  FROM documents
), sh AS (
  SELECT id, array_to_string(list_slice(t, i, i + 2), ' ') AS s
  FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) u(i)
), d AS (
  SELECT DISTINCT id, s FROM sh
), sz AS (
  SELECT id, CAST(count(*) AS BIGINT) AS sz FROM d GROUP BY id
), p AS (
  SELECT a.id AS ida, b.id AS idb, CAST(count(*) AS BIGINT) AS inter
  FROM d a JOIN d b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT ida AS id_a, idb AS id_b, inter,
       sa.sz + sb.sz - inter AS uni,
       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
FROM p JOIN sz sa ON sa.id = ida JOIN sz sb ON sb.id = idb
WHERE 100 * inter >= {ALLPAIRS_PCT} * (sa.sz + sb.sz - inter)
ORDER BY id_a, id_b
"""


register(QuerySpec("dedup_allpairs_exact", dedup_allpairs_exact,
                   ALLPAIRS_SQL,
                   "exact-recall similarity self-join: prefix-filtered "
                   "AllPairs over word-3-shingles, integer-threshold "
                   "Jaccard, naive co-occurrence oracle"))


# ---------------------------------------------------------------------------
# E91: URL canonicalization dedup (inject-then-collapse: the fixture
# text carries no URLs of its own, so variants are planted
# deterministically from doc_id and the oracle replants them)
# ---------------------------------------------------------------------------


def _url_injected_docs(docs: DataFrame) -> DataFrame:
    """Every doc gets ONE URL whose raw spelling varies by
    ``doc_id % 4`` over ``doc_id % 3`` page groups: plain https,
    http+www+trailing-slash, upper-case host + :443 + kept param +
    tracking param + fragment, and :80 + tracking-only query. Variants
    0/1/3 collapse to ``example{g}.com/Page{g}``; variant 2 keeps its
    real ``?q=2`` — the canonicalizer must collapse crawl noise AND
    preserve meaningful params."""
    g = F.pmod("doc_id", F.lit(3)).cast("string")
    v = F.pmod("doc_id", F.lit(4))
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://example"), g, F.lit(".com/Page"), g))
        .when(v == 1, F.concat(
            F.lit("http://www.example"), g, F.lit(".com/Page"), g,
            F.lit("/")))
        .when(v == 2, F.concat(
            F.lit("https://EXAMPLE"), g, F.lit(".com:443/Page"), g,
            F.lit("?q=2&utm_source=feed#sec")))
        .otherwise(F.concat(
            F.lit("http://example"), g, F.lit(".com:80/Page"), g,
            F.lit("?fbclid=abc")))
    )
    return docs.select(
        "doc_id", F.concat("text", F.lit(" see "), url).alias("txt")
    )


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup accounting (E91, RefinedWeb §3.2 shape)
    over the injected corpus: extract → canonicalize (pure Catalyst
    regexp chain) → ONE keyed aggregation. 3 page groups × the kept
    ``?q=2`` split → 6 canonical keys, each carrying its occurrence /
    raw-variant / doc counts and the min-id keep representative."""
    from kinesis_vcr_spark.operators.urldedup import (  # noqa: PLC0415
        url_dedup_groups,
    )

    docs = _url_injected_docs(load_table(spark, sf_dir, "documents"))
    return (
        url_dedup_groups(docs, id_col="doc_id", text_col="txt")
        .orderBy("canon_url")
    )


URL_DEDUP_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' see ' || CASE doc_id % 4
           WHEN 0 THEN 'https://example' || (doc_id % 3)
                       || '.com/Page' || (doc_id % 3)
           WHEN 1 THEN 'http://www.example' || (doc_id % 3)
                       || '.com/Page' || (doc_id % 3) || '/'
           WHEN 2 THEN 'https://EXAMPLE' || (doc_id % 3)
                       || '.com:443/Page' || (doc_id % 3)
                       || '?q=2&utm_source=feed#sec'
           ELSE 'http://example' || (doc_id % 3)
                || '.com:80/Page' || (doc_id % 3) || '?fbclid=abc'
         END AS txt
  FROM documents
), occ AS (
  SELECT doc_id, unnest(regexp_extract_all(txt, 'https?://[^\s]+')) AS raw_url
  FROM injected
), canon AS (
  SELECT doc_id, raw_url,
    regexp_replace(
     regexp_replace(
      regexp_replace(
       regexp_replace(
        regexp_replace(
         lower(regexp_extract(u2, '^([^/?]*)', 1))
           || regexp_replace(u2, '^[^/?]*', ''),
         '^www\.', ''),
        '^([^/?:]+):(?:80|443)([/?].*|$)', '\1\2'),
       '[?&](?:utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&]*', '', 'g'),
      '^([^?]*)&', '\1?'),
     '[/?&]+$', '') AS canon_url
  FROM (
    SELECT doc_id, raw_url,
           regexp_replace(regexp_replace(raw_url, '#.*', ''),
                          '^(?i:https?)://', '') AS u2
    FROM occ
  )
)
SELECT canon_url,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_variants,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM canon
GROUP BY canon_url
ORDER BY canon_url
"""


register(QuerySpec("url_canonical_dedup", url_canonical_dedup,
                   URL_DEDUP_SQL,
                   "URL-level crawl dedup: scheme/www/port/tracking-"
                   "param/fragment canonicalization as one Catalyst "
                   "regexp chain, then a single keyed aggregation"))
