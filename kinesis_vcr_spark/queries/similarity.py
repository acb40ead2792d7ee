"""Similarity-search queries over ``embeddings`` — the oracle-checkable
surface of :mod:`kinesis_vcr_spark.operators.similarity`.

The brute-force top-k has an exact DuckDB oracle (same sequential-fold
double arithmetic, same 6-dp rounding, same (cosine desc, vec_id)
tie-break). The ANN variant is approximate by design → registered
without an oracle (driver records rows-only); its recall against the
brute-force baseline is asserted in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.similarity import ann_topk, cosine_topk
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

N_QUERIES = 8  # vec_id < 8 are the probe set
TOP_K = 5


def _probe_set(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 8 probe vectors against the full table."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, _probe_set(emb), k=TOP_K
    ).orderBy("query_id", "rank")


COSINE_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM v
), u AS (
  SELECT vec_id, list_transform(e, x -> x / nrm) AS un FROM n
), scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         round(list_reduce(list_transform(range(1, 65),
                   i -> q.un[i] * v.un[i]), (x, y) -> x + y), 6) AS cosine
  FROM u q JOIN u v ON q.vec_id < {N_QUERIES} AND v.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def similarity_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-5 for the same probe set (approximate —
    rows-only driver check; recall vs brute force asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk(
        emb, _probe_set(emb), k=TOP_K, planes=32, bands=8
    ).orderBy("query_id", "rank")


register(
    QuerySpec(
        "similarity_cosine_topk",
        similarity_cosine_topk,
        COSINE_TOPK_SQL,
        "exact brute-force cosine top-k (broadcast probes, no shuffle of vectors)",
    )
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the probe set (deterministic hash-sampled
    centroids + 1 Lloyd step; rows-only driver check — approximate by
    design, exactness-at-full-probe asserted in tests/test_ivf.py)."""
    from kinesis_vcr_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, _probe_set(emb), k=TOP_K, k_centroids=16, nprobe=6
    ).orderBy("query_id", "rank")


register(
    QuerySpec(
        "similarity_ann_topk",
        similarity_ann_topk,
        None,  # approximate by design
        "hyperplane-LSH ANN top-k (bucketed candidates, measured recall)",
    )
)
register(
    QuerySpec(
        "similarity_ivf_topk",
        similarity_ivf_topk,
        None,  # approximate by design
        "IVF ANN top-k (inverted centroid lists, nprobe search)",
    )
)


def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN top-5 for the probe set: 32 subspaces x 32
    sub-centroids (~8x compression of the 64-dim float32 vectors,
    measured recall@5 = 0.725 on the near-random fixture — PQ's worst
    case), one Lloyd refinement, asymmetric-distance search —
    approximate by design (rows-only driver check; recall vs the
    brute-force baseline asserted in tests/test_pq.py)."""
    from kinesis_vcr_spark.operators.pq import (
        pq_adc_topk, pq_encode_table, train_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = train_pq(emb, m=32, ksub=32, refine_iterations=1)
    codes = pq_encode_table(emb, codebook)
    return pq_adc_topk(
        codes, _probe_set(emb), codebook, k=TOP_K
    ).orderBy("query_id", "rank")


register(
    QuerySpec(
        "similarity_pq_topk",
        similarity_pq_topk,
        None,  # approximate by design
        "product-quantization ADC top-k (m x ksub codebook, no decode)",
    )
)
