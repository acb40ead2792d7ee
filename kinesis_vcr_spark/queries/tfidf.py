"""Term-weighting analytics over the documents table — TF-IDF top
terms, BM25 ranked retrieval, and per-source vocabulary statistics.
The training-data-pipeline companion to :mod:`queries.textstats`:
corpus-level term statistics instead of per-document features.

Parity rules: tokenization is a plain space split in BOTH engines
(consistent with textstats); counts are exact integers; the only floats
are log-based weights, rounded ONCE at 6 dp before any ranking so an
ulp difference in the engines' ``ln`` can never flip an order; ranking
tiebreaks are total (term / doc_id ascending).

Scale posture: every aggregation is explode → groupBy (one shuffle each,
full map-side combine. The corpus-total doc count is a 1-row aggregate
broadcast into the score expression (same shape as q22's scalar
average); document-frequency joins are keyed shuffles on ``term``. The
global top-k orderings materialize k rows, not the corpus (sort +
limit pushes TakeOrdered to the map side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("hash", "join", "scan")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split("text", " ")).alias("term"),
    )


# --- TF-IDF top terms per language ---


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language by corpus TF-IDF (tf summed within the
    language, idf over the whole corpus: ln((N+1)/(df+1)))."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )
    total = docs.agg(F.count("*").alias("n_total"))  # 1 row, broadcast
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "term",
            "tf",
            "df_docs",
            F.round(
                F.col("tf")
                * F.log((F.col("n_total") + 1) / (F.col("df_docs") + 1)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "rank", "term", "tf", "df_docs", "score")
        .orderBy("lang", "rank")
    )


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df_docs
          FROM toks GROUP BY 1),
scored AS (
  SELECT lang, term, tf, df_docs,
         round(tf * ln(((SELECT count(*) FROM documents) + 1)
                       / (df_docs + 1.0)), 6) AS score
  FROM tf JOIN dfreq USING (term)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY score DESC, term
  ) AS rank FROM scored
)
SELECT lang, rank, term, tf, df_docs, score
FROM ranked WHERE rank <= 5 ORDER BY lang, rank
"""


# --- BM25 ranked retrieval ---


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed query {hash, join, scan} under
    BM25 (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))). Length
    normalization uses exact integer token counts; avgdl is an exact
    integer-sum ratio, so both engines divide identical values."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("dl")
    )
    stats = docs.agg(
        F.count("*").alias("n_total"),
        F.sum(F.size(F.split("text", " "))).alias("sum_dl"),
    )  # 1 row, broadcast: N and avgdl in one pass
    qtoks = toks.where(F.col("term").isin(*BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = qtoks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )
    avgdl = F.col("sum_dl") / F.col("n_total")
    idf = F.log(
        1
        + (F.col("n_total") - F.col("df_docs") + 0.5)
        / (F.col("df_docs") + 0.5)
    )
    part = idf * (
        F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    per_doc = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(part), 6).alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return per_doc.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(20)


BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT count(*) AS n_total,
                 sum(len(string_split(text, ' '))) AS sum_dl
          FROM documents),
qtoks AS (SELECT * FROM toks WHERE term IN ('hash', 'join', 'scan')),
tf AS (SELECT doc_id, term, count(*) AS tf FROM qtoks GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df_docs
          FROM qtoks GROUP BY 1)
SELECT doc_id,
       round(sum(
         ln(1 + (n_total - df_docs + 0.5) / (df_docs + 0.5))
         * (tf * (1.2 + 1))
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_dl * 1.0 / n_total)))
       ), 6) AS bm25,
       count(*) AS n_terms_hit
FROM tf
JOIN dfreq USING (term)
JOIN dl USING (doc_id)
CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


# --- per-source vocabulary statistics ---


def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: docs, token volume, vocabulary size, hapax count
    (terms seen exactly once in the source), mean tokens per doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    term_tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    per_source = term_tf.groupBy("source").agg(
        F.count("*").alias("vocab"),
        F.sum((F.col("tf") == 1).cast("long")).alias("hapax"),
        F.sum("tf").alias("n_tokens"),
    )
    n_docs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        per_source.join(n_docs, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "vocab",
            "hapax",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias(
                "avg_tokens"
            ),
        )
        .orderBy("source")
    )


VOCAB_SQL = """
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
term_tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
per_source AS (
  SELECT source, count(*) AS vocab,
         sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS hapax,
         sum(tf) AS n_tokens
  FROM term_tf GROUP BY source
),
n_docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, vocab,
       CAST(hapax AS BIGINT) AS hapax,
       round(n_tokens * 1.0 / n_docs, 6) AS avg_tokens
FROM per_source JOIN n_docs USING (source)
ORDER BY source
"""


# --- incremental BM25 via the persisted inverted index ---


def search_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-ingest shape of ranked retrieval: build the inverted
    index over the corpus (doc_id % 4 != 0), append the "new batch"
    (doc_id % 4 == 0), answer the standing BM25 query from the index
    alone (operators/searchindex.py). Exact contract: postings carry
    exact tf/dl and per-scope stats sum to the union's N/avgdl, so the
    probe equals ``bm25_search`` over ALL documents — which is exactly
    the oracle SQL."""
    import os
    import tempfile

    from kinesis_vcr_spark.operators.searchindex import (
        append_search_index,
        build_search_index,
        search_index_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    # deterministic per-sf path, rebuilt per run: the query gate
    # deliberately re-exercises build + append + probe (same contract
    # as dedup_index_incremental / span_index_incremental)
    path = os.path.join(
        tempfile.gettempdir(),
        f"kvs_searchindex_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    build_search_index(old, path)
    append_search_index(new, path, ingest_label="batch")
    return search_index_topk(spark, path, list(BM25_TERMS), k=20)


# --- phrase search (token adjacency), batch and positional index ---

PHRASE = ("hash", "join")


def phrase_search_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-document occurrence counts of the fixed token phrase
    — the vote re-indexing trick of operators/searchindex.py
    (``phrase_occurrences``): each matching token votes for start
    s = p − offset; a start with all offsets voting is an occurrence.
    One explode, one broadcast join against the 2-row phrase table,
    one aggregation — no self-join chain, no window."""
    from kinesis_vcr_spark.operators.searchindex import phrase_occurrences

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_occurrences(docs, list(PHRASE)).orderBy(
        F.col("n_occurrences").desc(), "doc_id"
    )


def phrase_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search answered from the persisted positional postings:
    index the corpus (doc_id % 4 != 0), append the batch
    (doc_id % 4 == 0), probe — per-doc counts over everything
    ingested equal the batch operator over the union (phrase counting
    is per-document, so the union answer IS the full-corpus answer —
    the oracle is the same SQL as ``phrase_search_counts``)."""
    import os
    import tempfile

    from kinesis_vcr_spark.operators.searchindex import (
        append_position_index,
        init_search_index,
        phrase_probe_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        f"kvs_phraseindex_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    # phrase-ONLY index (r15): the probe reads positional postings and
    # meta alone, so the BM25 postings/stats build the old
    # build_search_index call ran here was a full corpus aggregation +
    # write whose artifact this query never read (guide §1.2: don't
    # compute things you throw away). Corpus + batch are still fully
    # position-indexed per the query's contract.
    init_search_index(spark, path)
    append_position_index(old, path, ingest_label="_base")
    append_position_index(new, path, ingest_label="batch")
    return phrase_probe_index(spark, path, list(PHRASE)).orderBy(
        F.col("n_occurrences").desc(), "doc_id"
    )


PHRASE_SQL = """
WITH toks AS (
  SELECT doc_id, CAST(p AS INT) - 1 AS p,
         list_extract(string_split(text, ' '), CAST(p AS INT)) AS term
  FROM documents,
       unnest(range(1, len(string_split(text, ' ')) + 1)) t(p)
),
ph(term, i) AS (VALUES ('hash', 0), ('join', 1)),
votes AS (SELECT doc_id, p - i AS s, i FROM toks JOIN ph USING (term)),
starts AS (
  SELECT doc_id, s FROM votes GROUP BY doc_id, s
  HAVING count(DISTINCT i) = 2 AND s >= 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM starts GROUP BY doc_id
ORDER BY n_occurrences DESC, doc_id
"""


register(QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_SQL,
                   "top-5 TF-IDF terms per language"))
register(QuerySpec("bm25_search", bm25_search, BM25_SQL,
                   "BM25 top-20 docs for a fixed term query"))
register(QuerySpec("vocab_stats", vocab_stats, VOCAB_SQL,
                   "per-source vocabulary / hapax / length stats"))
register(QuerySpec("phrase_search_counts", phrase_search_counts,
                   PHRASE_SQL,
                   "exact per-doc occurrence counts of a fixed token "
                   "phrase via vote re-indexing (one explode + one "
                   "agg, no self-join chain)"))
register(QuerySpec("phrase_index_incremental", phrase_index_incremental,
                   PHRASE_SQL,
                   "phrase search answered from persisted positional "
                   "postings: corpus indexed, batch appended, pruned "
                   "probe == batch phrase counts over the union"))
register(QuerySpec("search_index_incremental", search_index_incremental,
                   BM25_SQL,
                   "incremental BM25 via the persisted inverted index: "
                   "corpus indexed, batch appended, standing query "
                   "answered from pruned postings == batch BM25 over "
                   "the union"))
