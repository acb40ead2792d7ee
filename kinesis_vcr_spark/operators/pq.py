"""Product quantization (PQ) — the memory-compression half of
large-scale ANN (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Scalar quantization (operators/quantize.py) compresses each DIMENSION
independently; PQ compresses each VECTOR: split the d-dim space into
``m`` subspaces, k-means each subspace to ``ksub`` centroids, and store
a vector as its ``m`` nearest-sub-centroid ids — d floats become m
small ints (64-dim float32 → 8 bytes at m=8, ksub=256: 32× smaller).
Search never decodes: a query builds an (m × ksub) inner-product table
against the codebook once, then every encoded vector's approximate
similarity is ``m`` table lookups (ADC — asymmetric distance
computation).

Spark shape, all deterministic:

- **train**: seed rows = the ``ksub`` vectors with the smallest
  ``xxhash64(id)`` (order-free sample, same discipline as
  operators/ivf.py:train_centroids), sliced per subspace; Lloyd
  refinement is fully distributed — one vectorized Pandas-UDF pass
  encodes all ``m`` subspaces per Arrow batch, then ONE
  posexplode→groupBy((sub, code, dim)) mean updates every sub-centroid
  of every subspace in a single shuffle. Collected state is the
  codebook itself (m·ksub·dsub floats — KBs, closure-sized).
- **encode**: one narrow Pandas-UDF projection; the (id, codes) table
  is the persistent 100 TB artifact.
- **search**: queries are broadcast (probe sets are small); the codes
  table is scanned once per batch with numpy table lookups, then the
  exact per-query top-k runs on the skew-safe two-phase path.

Unit-normalization first: on unit vectors max-inner-product ≡ max
cosine ≡ min L2, so ADC scores live on the same scale as the
brute-force cosine baseline (operators/similarity.py) and recall is
directly comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kinesis_vcr_spark.operators.ivf import _normalize_rows
from kinesis_vcr_spark.operators.topk import topk_per_group


def _encode_batch(mat: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(n × d) matrix → (n × m) int32 codes: per-subspace argmin L2
    against the sub-centroids (≡ argmax IP only after normalization,
    so use true L2 on the subvectors — subvectors are NOT unit)."""
    m, ksub, dsub = codebook.shape
    out = np.empty((mat.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cb = codebook[s]  # ksub × dsub
        # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        d2 = -2.0 * (sub @ cb.T) + (cb * cb).sum(axis=1)[None, :]
        out[:, s] = np.argmin(d2, axis=1)
    return out


def encode_pq(vec_col, codebook: np.ndarray):
    """Column of PQ codes (array<int>, length m) for a vector column."""
    cb = codebook

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(list(_encode_batch(mat, cb)))

    return enc(vec_col)


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 1,
) -> np.ndarray:
    """Deterministic PQ codebook: (m × ksub × d/m) numpy array.

    Seeds are the ``ksub`` hash-smallest vectors sliced per subspace;
    each Lloyd step re-encodes the corpus (vectorized UDF) and updates
    ALL m·ksub sub-centroids with one posexplode→groupBy mean — the
    update shuffle moves (m·ksub·dsub) aggregated rows, never vectors.
    """
    seeds = (
        vectors.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(ksub)
        .collect()
    )
    seed_mat = _normalize_rows(
        np.array([list(r[vec_col]) for r in seeds], dtype=np.float64)
    )
    d = seed_mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    codebook = np.stack(
        [seed_mat[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    )  # m × ksub × dsub

    def make_encoder(cb_state: np.ndarray):
        @pandas_udf("struct<codes: array<int>, unit: array<double>>")
        def enc_with_unit(vecs: pd.Series) -> pd.DataFrame:
            mat = _normalize_rows(
                np.vstack(vecs.to_numpy()).astype(np.float64)
            )
            return pd.DataFrame(
                {
                    "codes": list(_encode_batch(mat, cb_state)),
                    "unit": list(mat),
                }
            )

        return enc_with_unit

    for _ in range(refine_iterations):
        enc_with_unit = make_encoder(codebook)
        # the UDF emits (codes, unit-normalized vector) together — the
        # Arrow batch is materialized BEFORE the explode, so the
        # normalization never re-evaluates per exploded element (the
        # interpreted-HOF-under-Generate trap)
        coded = vectors.select(
            enc_with_unit(F.col(vec_col)).alias("r")
        ).select(F.col("r.codes").alias("codes"), F.col("r.unit").alias("u"))
        means = (
            coded.select(F.posexplode("u").alias("dim", "val"), "codes")
            .select(
                (F.col("dim") / dsub).cast("int").alias("sub"),
                (F.col("dim") % dsub).alias("dim_in"),
                F.element_at("codes", (F.col("dim") / dsub).cast("int") + 1)
                .alias("code"),
                "val",
            )
            .groupBy("sub", "code", "dim_in")
            # fix values to nano-units BEFORE summing: a double avg's
            # partial-merge order is partition-dependent, which would
            # let the "deterministic codebook" drift at ulp level and
            # flip argmin assignments near cell boundaries (repo-wide
            # fix-floats-to-ints-before-summing discipline)
            .agg(
                F.sum(
                    F.round(F.col("val") * F.lit(1e9)).cast("long")
                ).alias("s_nano"),
                F.count("*").alias("cnt"),
            )
            .collect()
        )
        new = codebook.copy()
        for r in means:
            new[r["sub"], r["code"], r["dim_in"]] = r["s_nano"] / (
                r["cnt"] * 1e9
            )
        codebook = new
    return codebook


def pq_encode_table(
    vectors: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — the compressed corpus, the artifact that persists
    at scale (m ints per vector instead of d floats)."""
    return vectors.select(
        F.col(id_col), encode_pq(F.col(vec_col), codebook).alias("codes")
    )


def pq_decode(codes: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(n × m) codes → (n × d) reconstructed matrix (test/debug path —
    production search is ADC and never reconstructs)."""
    m, _, dsub = codebook.shape
    return np.concatenate(
        [codebook[s][codes[:, s]] for s in range(m)], axis=1
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank_vectors: DataFrame | None = None,
    shortlist: int | None = None,
    rerank_vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k by ADC: per (query, vector) candidate,
    similarity = Σ_s ip_table[s, code_s] where ip_table is the query's
    inner-product table against the codebook — m lookups per
    candidate, no decode. Returns (query_id, vec_id, adc_sim) on the
    skew-safe two-phase top-k.

    Queries are collected and closure-broadcast (probe sets are
    fixed-size batches by contract — the planted fixture caps its
    sample for the same reason); per codes-row the UDF emits ONE
    array<double> of all query scores straight from a numpy gather-sum
    (nq × n matrix math per Arrow batch), posexploded JVM-side and
    mapped back to query ids through a broadcast (qidx, query_id)
    table. Two earlier shapes measured slower at 10× data (r7 session
    4): per-row array<struct{query_id, sim}> built by Python dicts
    (object churn, 16×), and a crossJoin shipping the 64-double query
    vector per candidate row (Arrow volume, 24×). This one moves one
    double per (candidate, query) and no Python objects.

    **Exact re-rank** (``rerank_vectors`` — the FAISS-refine second
    stage): ADC produces a per-query SHORTLIST of ``shortlist``
    candidates (default ``max(4·k, 50)``) instead of the final top-k;
    the shortlist's ORIGINAL vectors are then fetched (one narrow join
    of nq·R id pairs — never a vector shuffle) and scored with exact
    cosine, so the returned ``(query_id, vec_id, cosine, rank)`` is
    the true ordering within the shortlist. This is the documented fix
    for ADC's strict-recall collapse on tight clusters (BASELINE r11
    addendum 1: codes collapse inside a cluster and the fine ranking
    scrambles — 0.025 strict recall@5 with cluster-recall 1.0); with a
    shortlist covering the cluster, re-ranked recall is exact. Without
    ``rerank_vectors`` the output is the raw ADC ranking
    (query_id, vec_id, adc_sim, rank) exactly as before.
    """
    from pyspark.sql.functions import broadcast  # noqa: PLC0415

    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = [r[query_id_col] for r in qrows]  # native values, any id type
    qmat = _normalize_rows(
        np.array([list(r[query_vec_col]) for r in qrows], dtype=np.float64)
    )
    m, ksub, dsub = codebook.shape
    # per-query IP tables: (nq × m × ksub)
    tables = np.stack(
        [
            qmat[:, s * dsub : (s + 1) * dsub] @ codebook[s].T
            for s in range(m)
        ],
        axis=1,
    )
    nq = len(qids)

    @pandas_udf("array<double>")
    def adc_scores(code_series: pd.Series) -> pd.Series:
        cmat = np.vstack(code_series.to_numpy()).astype(np.int64)  # n × m
        sims = np.zeros((nq, cmat.shape[0]), dtype=np.float64)
        for s in range(m):
            sims += tables[:, s, :][:, cmat[:, s]]
        return pd.Series(list(np.round(sims.T, 6)))  # n rows × nq scores

    qid_type = queries.schema[query_id_col].dataType.simpleString()
    qmap = broadcast(
        codes.sparkSession.createDataFrame(
            [(i, qid) for i, qid in enumerate(qids)],
            f"qidx int, query_id {qid_type}",
        )
    )
    scored = (
        codes.select(
            id_col, F.posexplode(adc_scores(F.col("codes"))).alias(
                "qidx", "adc_sim"
            )
        )
        .join(qmap, "qidx")
        .select("query_id", id_col, "adc_sim")
    )
    if rerank_vectors is None:
        return topk_per_group(
            scored,
            key_cols=["query_id"],
            order_by=[F.col("adc_sim").desc(), F.col(id_col)],
            k=k,
            rank_col="rank",
        )
    from kinesis_vcr_spark.operators.similarity import (  # noqa: PLC0415
        exact_rerank_topk,
    )

    r = shortlist if shortlist is not None else max(4 * k, 50)
    short = topk_per_group(
        scored,
        key_cols=["query_id"],
        order_by=[F.col("adc_sim").desc(), F.col(id_col)],
        k=r,
    ).select(F.col("query_id").alias(query_id_col), id_col)
    return exact_rerank_topk(
        short,
        rerank_vectors,
        queries,
        k=k,
        id_col=id_col,
        vec_col=rerank_vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        exclude_self=exclude_self,
    )
