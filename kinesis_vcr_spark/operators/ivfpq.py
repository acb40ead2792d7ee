"""IVF-PQ residual index (E93) — the FAISS ``IndexIVFPQ`` shape.

IVF alone (operators/ivf.py) prunes the search to nprobe inverted
lists but still stores and scans full vectors; PQ alone
(operators/pq.py) compresses every vector to m bytes-ish codes but
scans ALL of them per query. Production ANN at corpus scale (Jégou,
Douze, Schmid 2011 §IV; every FAISS deployment) combines them: a
coarse quantizer routes each vector to a list, PQ encodes the
RESIDUAL ``x − c(x)`` (residuals concentrate near 0, so the same
codebook budget quantizes them far better than raw vectors), and a
query scans only its nprobe lists, scoring candidates by ADC table
lookups without ever reconstructing a vector.

Scoring decomposition (all vectors unit-normalized, cosine ≡ inner
product): ``q·x = q·c_list + q·r ≈ q·c_list + Σ_s table[s, code_s]``
where ``table[s] = q_sub_s @ codebook[s].T`` is computed ONCE per
query — the residual codebook is shared across lists (FAISS default),
so the per-list term is a single scalar add.

Determinism discipline (repo-wide): hash-smallest seeds, one
distributed Lloyd step per refinement with values fixed to integer
nano-units before the mean-sum (a double sum's partial-merge order is
partition-dependent), ADC scores rounded to 6 dp — independently
built indexes are bit-comparable and the planted-twin driver query
(queries/similarity.py ``similarity_ivfpq_planted``) carries an EXACT
oracle.

100 TB posture: the persisted artifact is ``(cid, vec_id, codes)`` —
m small ints per vector (the ivf.py ``_write_lists`` layout applies
unchanged: partitioned by list id, probes prune to nprobe/k_centroids
of the files). Training collects only centroid/codebook-sized tables;
encode is one Arrow-batched UDF pass; the probe broadcasts the query
set (broadcast-probes contract shared with pq/ivf) and rides the
skew-safe two-phase top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kinesis_vcr_spark.operators.ivf import _rm_recursive, train_centroids
from kinesis_vcr_spark.operators.pq import _encode_batch, _normalize_rows
from kinesis_vcr_spark.operators.topk import topk_per_group


def residual_frame(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, res): nearest-centroid assignment + residual
    ``unit(x) − c_cid`` in ONE Arrow-batched pass (the batch
    materializes both before any downstream explode — the
    HOF-under-Generate discipline from train_pq)."""
    cmat = centroids

    @pandas_udf("struct<cid: int, res: array<double>>")
    def assign_res(vecs: pd.Series) -> pd.DataFrame:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        cid = np.argmax(mat @ cmat.T, axis=1)
        return pd.DataFrame(
            {"cid": cid.astype(np.int32), "res": list(mat - cmat[cid])}
        )

    return vectors.select(
        F.col(id_col), assign_res(F.col(vec_col)).alias("r")
    ).select(id_col, F.col("r.cid").alias("cid"), F.col("r.res").alias("res"))


def train_residual_pq(
    residuals: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    res_col: str = "res",
    refine_iterations: int = 1,
) -> np.ndarray:
    """Deterministic (m × ksub × d/m) codebook over RESIDUAL vectors.

    Same recipe as pq.train_pq but WITHOUT unit normalization —
    residuals are small non-unit vectors by construction and
    normalizing them would erase exactly the magnitude information PQ
    is here to keep. Seeds are the residuals of the ksub hash-smallest
    ids; each Lloyd step is one encode pass + one posexplode →
    groupBy((sub, code, dim)) mean whose values are nano-fixed before
    summing (pq.py's float-determinism discipline)."""
    seeds = (
        residuals.select(F.col(res_col), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(ksub)
        .collect()
    )
    seed_mat = np.array([list(r[res_col]) for r in seeds], dtype=np.float64)
    d = seed_mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    codebook = np.stack(
        [seed_mat[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    )

    def make_encoder(cb_state: np.ndarray):
        @pandas_udf("array<int>")
        def enc(vecs: pd.Series) -> pd.Series:
            mat = np.vstack(vecs.to_numpy()).astype(np.float64)
            return pd.Series(list(_encode_batch(mat, cb_state)))

        return enc

    for _ in range(refine_iterations):
        enc = make_encoder(codebook)
        coded = residuals.select(
            F.col(res_col).alias("u"), enc(F.col(res_col)).alias("codes")
        )
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


def ivfpq_encode_table(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, codes) — the persisted IVF-PQ artifact: list
    assignment + residual PQ codes in one Arrow pass."""
    cmat = centroids
    cb = codebook

    @pandas_udf("struct<cid: int, codes: array<int>>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        cid = np.argmax(mat @ cmat.T, axis=1)
        codes = _encode_batch(mat - cmat[cid], cb)
        return pd.DataFrame({"cid": cid.astype(np.int32), "codes": list(codes)})

    return vectors.select(
        F.col(id_col), enc(F.col(vec_col)).alias("r")
    ).select(id_col, F.col("r.cid").alias("cid"), F.col("r.codes").alias("codes"))


def build_ivfpq(
    vectors: DataFrame,
    k_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 1,
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """(centroids, residual codebook, codes table) — train the coarse
    quantizer, train PQ on its residuals, encode the corpus."""
    centroids = train_centroids(
        vectors, k_centroids, id_col, vec_col,
        refine_iterations=refine_iterations,
    )
    res = residual_frame(vectors, centroids, id_col, vec_col)
    codebook = train_residual_pq(
        res, m=m, ksub=ksub, id_col=id_col,
        refine_iterations=refine_iterations,
    )
    return centroids, codebook, ivfpq_encode_table(
        vectors, centroids, codebook, id_col, vec_col
    )


def ivfpq_topk(
    codes: DataFrame,
    centroids: np.ndarray,
    codebook: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over the IVF-PQ index: each query scans ONLY
    its nprobe nearest lists; candidate score = q·c_list + ADC residual
    lookups (m adds per candidate, no reconstruction). Returns
    (query_id, vec_id, adc_sim) on the skew-safe two-phase top-k.

    Queries are collected and closure-broadcast (broadcast-probes
    contract, same as pq_adc_topk); the codes scan is pre-filtered to
    the UNION of probed lists (at most nq·nprobe of k_centroids lists
    — with a persisted ``_write_lists`` layout that filter is
    partition pruning, not a scan)."""
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = [r[query_id_col] for r in qrows]
    qmat = _normalize_rows(
        np.array([list(r[query_vec_col]) for r in qrows], dtype=np.float64)
    )
    m, ksub, dsub = codebook.shape
    csims = qmat @ centroids.T  # nq × k_centroids: the q·c_list term
    order = np.argsort(-csims, axis=1)[:, :nprobe]  # nq × nprobe
    probed_mask = np.zeros((len(qids), centroids.shape[0]), dtype=bool)
    for qi in range(len(qids)):
        probed_mask[qi, order[qi]] = True
    tables = np.stack(
        [qmat[:, s * dsub : (s + 1) * dsub] @ codebook[s].T for s in range(m)],
        axis=1,
    )  # nq × m × ksub
    all_probed = sorted({int(c) for row in order for c in row})

    qid_type = queries.schema[query_id_col].dataType.simpleString()

    @pandas_udf(f"array<struct<query_id: {qid_type}, adc_sim: double>>")
    def adc(code_series: pd.Series, cid_series: pd.Series) -> pd.Series:
        cmat = np.vstack(code_series.to_numpy()).astype(np.int64)  # n × m
        cids = cid_series.to_numpy().astype(np.int64)  # n
        res_sims = np.zeros((len(qids), cmat.shape[0]), dtype=np.float64)
        for s in range(m):
            res_sims += tables[:, s, :][:, cmat[:, s]]
        sims = res_sims + csims[:, cids]  # add the per-list q·c term
        visible = probed_mask[:, cids]  # nq × n: did q probe this list?
        out = []
        for i in range(cmat.shape[0]):
            out.append(
                [
                    {
                        "query_id": qids[q],
                        "adc_sim": round(float(sims[q, i]), 6),
                    }
                    for q in range(len(qids))
                    if visible[q, i]
                ]
            )
        return pd.Series(out)

    scored = (
        codes.where(F.col("cid").isin(all_probed))
        .select(id_col, F.explode(adc(F.col("codes"), F.col("cid"))).alias("hit"))
        .select(
            F.col("hit.query_id").alias("query_id"),
            id_col,
            F.col("hit.adc_sim").alias("adc_sim"),
        )
    )
    return topk_per_group(
        scored,
        key_cols=["query_id"],
        order_by=[F.col("adc_sim").desc(), F.col(id_col)],
        k=k,
        rank_col="rank",
    )


# ---------------------------------------------------------------------------
# persisted artifact (same layout + ingest-scope contract as the IVF
# index — operators/ivf.py — with the codebook stored beside the
# centroids; probes prune to the probed cid partitions)
# ---------------------------------------------------------------------------


def _write_code_lists(
    codes: DataFrame, index_path: str, ingest_label: str,
    mode: str = "overwrite",
) -> None:
    (
        codes.repartition("cid")  # cluster lists on disk, one dir per cid
        .write.mode(mode)
        .partitionBy("cid")
        .parquet(f"{index_path}/lists/ingest={ingest_label}")
    )


def build_ivfpq_index(
    vectors: DataFrame,
    index_path: str,
    k_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 1,
) -> None:
    """Train and PERSIST the IVF-PQ index: centroids + residual
    codebook + the encoded lists ``(vec_id, codes)`` partitioned by
    ``cid`` under ``ingest=<label>`` scopes. Build once, probe many —
    the artifact is m small ints per vector, 8-32× smaller than the
    float lists the plain IVF index stores, which is the entire reason
    this index exists at corpus scale."""
    spark = vectors.sparkSession
    centroids, codebook, codes = build_ivfpq(
        vectors, k_centroids, m, ksub, id_col, vec_col, refine_iterations
    )
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_path}/centroids")
    mm, kk, dsub = codebook.shape
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in codebook[s, c]])
            for s in range(mm)
            for c in range(kk)
        ],
        "sub int, code int, vals array<double>",
    ).write.mode("overwrite").parquet(f"{index_path}/codebook")
    # fresh build replaces the artifact — stale ingest scopes from a
    # previous build must not leak into partition discovery
    _rm_recursive(spark, f"{index_path}/lists")
    _write_code_lists(codes, index_path, "_base")


def load_ivfpq_index(
    spark, index_path: str
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """(centroids, codebook, lists DataFrame) from
    :func:`build_ivfpq_index` output; the ``ingest`` provenance column
    is dropped from the probe-facing frame."""
    crows = (
        spark.read.parquet(f"{index_path}/centroids").orderBy("cid").collect()
    )
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)
    brows = (
        spark.read.parquet(f"{index_path}/codebook")
        .orderBy("sub", "code")
        .collect()
    )
    m = max(r["sub"] for r in brows) + 1
    ksub = max(r["code"] for r in brows) + 1
    dsub = len(brows[0]["vals"])
    codebook = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in brows:
        codebook[r["sub"], r["code"]] = r["vals"]
    lists = spark.read.parquet(f"{index_path}/lists").drop("ingest")
    return centroids, codebook, lists


def append_ivfpq_index(
    vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ingest_label: str = "_appends",
) -> None:
    """Extend a persisted IVF-PQ index WITHOUT retraining: encode the
    batch against the FROZEN stored centroids + codebook, write it as
    its own ``ingest`` scope. O(batch); probe parity with a
    same-artifact full re-encode is exact because encoding is a pure
    function of (centroids, codebook, vector).

    Write-mode contract mirrors the IVF/near-dup indexes: an explicit
    label overwrites only its own scope (orchestrator replay
    idempotence); the default ``_appends`` scope ACCUMULATES
    (mode=append) and idempotence is the caller's problem. Frozen
    artifacts drift in QUALITY as the corpus shifts (residuals of
    far-from-centroid data quantize worse, lists unbalance) — monitor
    and rebuild, exactly like production IVFPQ systems."""
    spark = vectors.sparkSession
    centroids, codebook, _ = load_ivfpq_index(spark, index_path)
    codes = ivfpq_encode_table(vectors, centroids, codebook, id_col, vec_col)
    mode = "append" if ingest_label == "_appends" else "overwrite"
    _write_code_lists(codes, index_path, ingest_label, mode=mode)


def compact_ivfpq_index(spark, index_path: str) -> None:
    """Collapse accumulated ingest scopes into one compacted scope,
    preserving the ``cid`` clustering — probe results identical
    before/after; run only while no ingest is writing."""
    from kinesis_vcr_spark.operators.compaction import (  # noqa: PLC0415
        compact_scoped_state,
    )

    compact_scoped_state(spark, f"{index_path}/lists", ("cid",))


def ivfpq_topk_indexed(
    index: tuple[np.ndarray, np.ndarray, DataFrame],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k against a persisted index — no training, no re-encode;
    the ``cid isin(probed)`` filter prunes the scan to the probed
    partition directories (plan-pinned in tests)."""
    centroids, codebook, lists = index
    return ivfpq_topk(
        lists, centroids, codebook, queries, k=k, nprobe=nprobe,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        id_col=id_col,
    )
