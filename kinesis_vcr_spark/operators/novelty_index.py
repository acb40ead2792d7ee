"""Persisted incremental novelty index — score a NEW batch's n-gram
novelty against an EXISTING corpus without re-shingling the corpus.

The daily-ingest twin of :mod:`operators.novelty`, following the
build-once/probe-many artifact discipline of
:mod:`operators.dedup_index`: re-running ``doc_ngram_novelty`` over
corpus ∪ batch re-shingles the whole corpus every day — O(corpus) work
for an O(batch) question. Instead the corpus's DISTINCT shingle set is
persisted once as parquet ``(shingle, first_seen)``; each new batch is
shingled alone (linear in the batch), LEFT-joined against the stored
shingles, and a batch shingle is novel iff it is absent from the index
AND this doc is the batch-internal first occurrence (min doc_id within
the batch). ``update_novelty_index`` then appends exactly those
batch-first shingles so the index stays current.

Parity contract (tests/test_novelty_index.py): for batch ids all
GREATER than every indexed id (the ingest-order invariant the caller
already owns), probe output == ``doc_ngram_novelty(corpus ∪ batch)``
restricted to the batch's docs — bit-for-bit, because both paths share
the same shingle expressions and the same min-ordering.

Scale posture:

- probe shuffle = stored shingle table (one row per DISTINCT corpus
  shingle — heavy-tailed corpora saturate: English web trigram vocab
  grows far slower than the corpus) + the batch's edges, hash-joined
  on shingle; never O(corpus text);
- the update appends only batch-first shingles — the index file count
  grows per day, so periodically ``compact_novelty_index`` (same
  single-rewrite pattern as compact_near_dup_index);
- at the very largest scales write the shingle table bucketed by
  shingle in the metastore (the build_near_dup_index_bucketed pattern
  verbatim) so the probe shuffles ONLY the batch; not duplicated here
  — the bucketed mechanics are already proven in dedup_index.

No reference counterpart; additive engine layer (E111's ingest twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.novelty import ngram_first_seen, shingle_edges

# bounded-liveness cache tracking (ADVICE r13): each probe evicts the
# previous probe's cached shingle explode instead of leaking one cached
# relation per call in a long-lived ingest session — cacheutil contract.
_CACHE_SCOPE = "novelty_index"


def _persist_tracked(df: DataFrame) -> DataFrame:
    from kinesis_vcr_spark.cacheutil import evict_tracked, persist_tracked

    evict_tracked(_CACHE_SCOPE)
    return persist_tracked(_CACHE_SCOPE, df)


def build_novelty_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> None:
    """One-time corpus pass: distinct ``(shingle, first_seen)`` to
    parquet. first_seen is kept (not just membership) so the index can
    also answer provenance queries and re-derive per-corpus novelty."""
    edges = shingle_edges(docs, id_col, text_col, n)
    ngram_first_seen(edges, id_col).write.mode("error").parquet(
        f"{path}/shingles"
    )


def load_novelty_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/shingles")


def novelty_against_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-batch-doc novelty vs the accumulated corpus: (id,
    total_ngrams, novel_ngrams, novelty).

    A shingle counts as novel for doc d iff it is NOT in the index and
    d is its batch-internal first occurrence — exactly the semantics of
    the full recompute when batch ids follow all indexed ids. Batch ids
    already present in the index are the caller's key-discipline bug;
    they would silently skew min() so they are rejected loudly by the
    update path (and the parity test pins the contract).
    """
    edges = _persist_tracked(shingle_edges(batch, id_col, text_col, n))
    batch_first = ngram_first_seen(edges, id_col).withColumnRenamed(
        "first_seen", "batch_first"
    )
    stored = load_novelty_index(spark, index_path).select(
        "shingle", F.lit(True).alias("_indexed")
    )
    # shingle-keyed joins: batch side is day-sized; the stored side's
    # scan is the O(|vocab|) cost the module docstring accounts for
    flagged = (
        edges.join(batch_first, "shingle")
        .join(stored, "shingle", "left")
        .withColumn(
            "_novel",
            (
                F.col("_indexed").isNull()
                & (F.col("batch_first") == F.col(id_col))
            ).cast("int"),
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("total_ngrams"),
            F.sum("_novel").cast("long").alias("novel_ngrams"),
        )
        .select(
            id_col,
            "total_ngrams",
            "novel_ngrams",
            F.round(
                F.col("novel_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def update_novelty_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> None:
    """Append the batch's index-new shingles with their batch-internal
    first_seen. Raises if any batch id is ≤ the indexed max (the
    ingest-order invariant novelty semantics depend on)."""
    stored = load_novelty_index(spark, index_path)
    max_indexed = stored.agg(F.max("first_seen")).first()[0]
    if max_indexed is not None:
        bad = batch.where(F.col(id_col) <= F.lit(max_indexed)).limit(1).count()
        if bad:
            raise ValueError(
                f"update_novelty_index: batch contains ids ≤ indexed max "
                f"({max_indexed}) — novelty's first-seen ordering requires "
                "monotone ingest ids; re-key the batch"
            )
    edges = shingle_edges(batch, id_col, text_col, n)
    new_first = ngram_first_seen(edges, id_col)
    (
        new_first.join(
            stored.select("shingle", F.lit(True).alias("_indexed")),
            "shingle",
            "left",
        )
        .where(F.col("_indexed").isNull())
        .select("shingle", "first_seen")
        .write.mode("append")
        .parquet(f"{index_path}/shingles")
    )


def build_novelty_bloom(
    stored: DataFrame, m_bits: int = 2**20, n_hashes: int = 7
) -> DataFrame:
    """Bloom filter OF the stored shingle vocabulary — the constant-
    memory probe path when the exact index outgrows a join side (a
    100 TB corpus's trigram vocabulary is billions of rows; the filter
    is ≤ m/32 words broadcast to the batch scan, zero shuffle of
    anything). Built distributed via operators/bloom.py's portable
    sparse filter; merge daily increments with ``bloom_merge``."""
    from kinesis_vcr_spark.operators.bloom import bloom_build  # noqa: PLC0415

    return bloom_build(
        stored.select("shingle"), "shingle", m_bits=m_bits, n_hashes=n_hashes
    )


def novelty_against_bloom(
    bloom: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 2**20,
    n_hashes: int = 7,
) -> DataFrame:
    """Approximate batch novelty with ONE-SIDED error: the Bloom probe
    has no false negatives, so an indexed shingle never counts as novel
    — ``novel_ngrams`` is an UNDERESTIMATE (definitely-novel only) and
    ``novelty`` a lower bound, with expected relative shortfall ≈ the
    filter's FP rate (<1% at the classic 10 bits/key, h=7). The exact
    join path (:func:`novelty_against_index`) remains the oracle; this
    is the same exact-vs-sketch pairing as decontam_bloom vs
    decontam_ngram_overlap (E66/E28)."""
    from kinesis_vcr_spark.operators.bloom import bloom_probe  # noqa: PLC0415

    edges = _persist_tracked(shingle_edges(batch, id_col, text_col, n))
    batch_first = ngram_first_seen(edges, id_col).withColumnRenamed(
        "first_seen", "batch_first"
    )
    probed = bloom_probe(
        edges,
        "shingle",
        bloom,
        m_bits=m_bits,
        n_hashes=n_hashes,
        flag_col="maybe_member",
        group_cols=[id_col, "shingle"],
    )
    flagged = probed.join(batch_first, "shingle").withColumn(
        "_novel",
        (
            (~F.col("maybe_member"))
            & (F.col("batch_first") == F.col(id_col))
        ).cast("int"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("total_ngrams"),
            F.sum("_novel").cast("long").alias("novel_ngrams"),
        )
        .select(
            id_col,
            "total_ngrams",
            "novel_ngrams",
            F.round(
                F.col("novel_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def compact_novelty_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite the appended shingle table as one compact generation
    (same pattern as compact_near_dup_index): day-sized appends
    accumulate small files; the data itself is already distinct."""
    stored = load_novelty_index(spark, index_path).persist()
    stored.count()  # materialize before overwriting the source
    tmp = f"{index_path}/shingles_compact"
    stored.coalesce(max(1, stored.rdd.getNumPartitions() // 8)).write.mode(
        "error"
    ).parquet(tmp)
    # atomic-enough swap for a local/test filesystem; object stores use
    # their rename/commit protocol via the committer, same as dedup_index
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    fs = jvm_path(index_path).getFileSystem(conf)
    fs.delete(jvm_path(f"{index_path}/shingles"), True)
    fs.rename(jvm_path(tmp), jvm_path(f"{index_path}/shingles"))
    stored.unpersist()


__all__ = [
    "build_novelty_bloom",
    "build_novelty_index",
    "compact_novelty_index",
    "load_novelty_index",
    "novelty_against_bloom",
    "novelty_against_index",
    "update_novelty_index",
]
