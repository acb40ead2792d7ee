"""IVF (inverted-file) approximate nearest neighbor — the
coarse-quantizer alternative to hyperplane LSH (operators/similarity).

Index = a small set of centroids + an assignment of every vector to its
nearest centroid (the "inverted lists"). Search probes only the
``nprobe`` nearest lists per query. Centroids are deterministic:
hash-sampled seed vectors refined by one Lloyd iteration (both steps
are plain DataFrame ops; the per-row nearest-centroid assignment is a
vectorized Pandas UDF — one numpy matmul per Arrow batch, same pattern
as hyperplane banding).

Scale posture: the index build is two narrow passes + one tiny
groupBy (k x dim rows); the assigned table (`vec_id`, `centroid_id`)
is the persistent artifact at 100 TB — search shuffles only candidate
lists, never the full vector table. Centroid count is the knob:
k ≈ sqrt(N) keeps lists O(sqrt(N)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from kinesis_vcr_spark.operators.similarity import (
    pandas_cosine_unit,
    round_cosine,
    unit_double,
)


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 1,
) -> np.ndarray:
    """Deterministic centroids: the k vectors with the smallest
    xxhash64(id) are the seeds (an order-free pseudo-random sample),
    refined by ``refine_iterations`` Lloyd steps. Returns a unit-row
    (k x dim) numpy matrix — small enough to close over in the
    assignment UDF.

    Each Lloyd step is fully distributed: assign (Pandas-UDF matmul) →
    posexplode → groupBy (centroid, dim) mean → collect k x dim rows.
    """
    seeds = (
        vectors.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    centroids = _normalize_rows(
        np.array([list(r[vec_col]) for r in seeds], dtype=np.float64)
    )
    for _ in range(refine_iterations):
        assigned = vectors.select(
            F.col(vec_col),
            assign_centroid(F.col(vec_col), centroids).alias("cid"),
        )
        means = (
            assigned.select(
                "cid", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["m"]
        for cid, dims in by_cid.items():
            new[cid] = [dims[d] for d in range(centroids.shape[1])]
        centroids = _normalize_rows(new)
    return centroids


def assign_centroid(vec, centroids: np.ndarray):
    """Nearest-centroid id (max cosine ≡ max dot against unit centroid
    rows) as a vectorized Pandas UDF column."""
    cmat = centroids.T  # dim x k

    @pandas_udf(IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(mat @ cmat, axis=1).astype(np.int32))

    return nearest(vec)


def probe_centroids(vec, centroids: np.ndarray, nprobe: int,
                    ring_margin: float = 0.0):
    """Array of the ``nprobe`` nearest centroid ids per query vector.

    ``ring_margin`` (r13, VERDICT r12 item 2 — multi-probe): also
    include every centroid whose cosine to the query is within
    ``ring_margin`` of the ``nprobe``-th nearest. A trained coarse
    router sometimes splits one tight cluster across two lists; a
    query near that boundary then sees both centroids at nearly the
    same similarity, and a FIXED nprobe cut drops the twin list — the
    exact failure behind the IVF-PQ 0.9781 strict-recall residual
    (BASELINE r12 addendum 1). The ring is data-adaptive: far from
    any boundary it adds nothing (probe count stays nprobe); on a
    straddle it picks up precisely the tied lists. Probe count stays
    ≤ k_centroids, so the candidate bound Θ(nq·n·probes/k_centroids)
    and the partition-pruning contract are unchanged in shape."""
    cmat = centroids.T

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        sims = mat @ cmat
        order = np.argsort(-sims, axis=1)
        if ring_margin <= 0.0:
            return pd.Series(list(order[:, :nprobe].astype(np.int32)))
        out = []
        for i in range(len(mat)):
            row = order[i]
            srow = sims[i, row]  # descending
            cut = srow[min(nprobe, len(row)) - 1] - ring_margin
            n_take = int(np.searchsorted(-srow, -cut, side="right"))
            out.append(row[:max(nprobe, n_take)].astype(np.int32))
        return pd.Series(out)

    return probes(vec)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
    ring_margin: float = 0.0,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` nearest inverted lists per
    query, exact-cosine-rank within the candidates. Same output shape
    as ``cosine_topk`` (query_id, vec_id, cosine, rank); recall grows
    with nprobe/k_centroids (nprobe = k_centroids ⇒ exact search).

    Pass a pre-trained ``centroids`` matrix to reuse an index across
    queries (at scale: persist the assigned table too).
    """
    if centroids is None:
        centroids = train_centroids(
            vectors, k_centroids, id_col=id_col, vec_col=vec_col
        )
    v = vectors.select(
        F.col(id_col),
        unit_double(F.col(vec_col)).alias("__v_unit"),
        assign_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    q = queries.select(
        F.col(query_id_col),
        unit_double(F.col(vec_col)).alias("__q_unit"),
        F.explode(
            probe_centroids(F.col(vec_col), centroids, nprobe,
                            ring_margin)
        ).alias("cid"),
    )
    cand = q.join(v, "cid")
    return _rank_candidates(cand, query_id_col, id_col, k, exclude_self)


def _rank_candidates(
    cand: DataFrame,
    query_id_col: str,
    id_col: str,
    k: int,
    exclude_self: bool,
) -> DataFrame:
    if exclude_self:
        cand = cand.where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        cand.select(
            query_id_col,
            id_col,
            round_cosine(
                pandas_cosine_unit(F.col("__q_unit"), F.col("__v_unit"))
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _rm_recursive(spark, path: str) -> None:
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _write_lists(
    vectors: DataFrame,
    index_path: str,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
    ingest_label: str,
    mode: str = "overwrite",
) -> None:
    (
        vectors.select(
            F.col(id_col),
            unit_double(F.col(vec_col)).alias("__v_unit"),
            assign_centroid(F.col(vec_col), centroids).alias("cid"),
        )
        # cluster the lists on disk so a probe reads contiguous data
        .repartition("cid")
        .write.mode(mode)  # scoped to THIS ingest's subtree
        .partitionBy("cid")
        .parquet(f"{index_path}/lists/ingest={ingest_label}")
    )


def build_ivf_index(
    vectors: DataFrame,
    index_path: str,
    k_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train and PERSIST the IVF index: centroids + the assigned
    inverted lists (id, unit vector, centroid id) as parquet under
    ``index_path``. Build once, query many — at corpus scale the
    k-means pass and the per-vector assignment are the costs to pay
    once, not per query batch; a later search is one parquet scan
    pruned to the probed lists plus the re-rank.

    Lists live under ``lists/ingest=<label>`` scopes (same layout as
    the near-dup index, operators/dedup_index.py):
    :func:`append_ivf_index` adds a new vector batch as its own scope
    without touching the existing lists, and a labeled re-run
    overwrites only itself (orchestrator replay safety)."""
    spark = vectors.sparkSession
    centroids = train_centroids(
        vectors, k_centroids, id_col=id_col, vec_col=vec_col
    )
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_path}/centroids")
    # fresh build replaces the whole artifact — stale ingest scopes
    # from a previous build must not leak into partition discovery
    _rm_recursive(spark, f"{index_path}/lists")
    _write_lists(vectors, index_path, centroids, id_col, vec_col, "_base")


def append_ivf_index(
    vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ingest_label: str = "_appends",
) -> None:
    """Extend a persisted IVF index with a new vector batch WITHOUT
    retraining: assign against the FROZEN stored centroids, write the
    assignments as their own ``ingest`` scope. O(batch) work — the
    incremental-ingest counterpart of the near-dup index's append.

    Contract: frozen centroids mean a probe over the appended index is
    IDENTICAL to a probe over an index of old ∪ new assigned with the
    same centroids (parity-tested); what drifts over many appends is
    list balance (new data far from any centroid piles into its
    nearest list) — monitor list sizes and re-train/rebuild when the
    largest list outgrows the probe budget, exactly like production
    IVF systems.

    Write mode mirrors the near-dup index contract
    (operators/dedup_index.py): an EXPLICIT ``ingest_label`` overwrites
    only its own scope (orchestrator replay idempotence), while the
    default ``_appends`` scope ACCUMULATES — two default-label appends
    must both survive, so the unlabeled scope uses mode=append and
    idempotence is then the caller's problem."""
    spark = vectors.sparkSession
    centroids, _ = load_ivf_index(spark, index_path)
    mode = "append" if ingest_label == "_appends" else "overwrite"
    _write_lists(
        vectors, index_path, centroids, id_col, vec_col, ingest_label,
        mode=mode,
    )


def compact_ivf_index(spark, index_path: str) -> None:
    """Collapse accumulated ``lists/ingest=<label>`` scopes (daily
    appends) into one compacted scope, preserving the ``cid`` physical
    clustering — probe results identical before/after (test-pinned);
    run only while no ingest is writing. Same swap contract as the
    near-dup index compaction
    (:func:`~kinesis_vcr_spark.operators.compaction.compact_scoped_state`)."""
    from kinesis_vcr_spark.operators.compaction import compact_scoped_state

    compact_scoped_state(spark, f"{index_path}/lists", ("cid",))


def load_ivf_index(spark, index_path: str) -> tuple[np.ndarray, DataFrame]:
    """(centroids matrix, inverted-lists DataFrame) from
    :func:`build_ivf_index` output; the ``ingest`` provenance
    partition column is dropped from the probe-facing frame."""
    rows = (
        spark.read.parquet(f"{index_path}/centroids").orderBy("cid").collect()
    )
    centroids = np.array([r["centroid"] for r in rows], dtype=np.float64)
    lists = spark.read.parquet(f"{index_path}/lists")
    lists = lists.drop("ingest")
    return centroids, lists


def ivf_topk_indexed(
    index: tuple[np.ndarray, DataFrame],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    ring_margin: float = 0.0,
) -> DataFrame:
    """ANN top-k against a persisted index (:func:`build_ivf_index` /
    :func:`load_ivf_index`) — no training, no re-assignment; the
    ``cid`` equi-join prunes the scan to the probed partitions.
    Identical results to :func:`ivf_topk` with the same centroids."""
    centroids, lists = index
    q = queries.select(
        F.col(query_id_col),
        unit_double(F.col(vec_col)).alias("__q_unit"),
        F.explode(
            probe_centroids(F.col(vec_col), centroids, nprobe,
                            ring_margin)
        ).alias("cid"),
    )
    cand = q.join(lists, "cid")
    return _rank_candidates(cand, query_id_col, id_col, k, exclude_self)


def ivf_list_balance(
    spark,
    index_path: str,
    skew_threshold: float = 4.0,
) -> dict:
    """Per-list sizes + a drift verdict for a persisted IVF-family
    index (:func:`build_ivf_index` or ivfpq's ``build_ivfpq_index`` —
    both store ``lists/`` partitioned by ``cid`` beside
    ``centroids/``). This is the operator behind the "monitor list
    sizes and re-train when the largest list outgrows the probe
    budget" contract that :func:`append_ivf_index` /
    ``append_ivfpq_index`` document: frozen-centroid appends are
    O(batch), but data far from every centroid piles into its nearest
    list, and a probe's cost is the size of the lists it touches.

    Cost: ONE metadata-sized aggregation — a count per cid (k rows
    collected, k = centroid count), no vector payload read; column
    pruning means the scan touches only the ``cid`` partition values.

    Verdict: ``needs_retrain`` is true when the largest list exceeds
    ``skew_threshold ×`` the balanced size n/k — i.e. the worst-case
    probed list costs ``skew_threshold ×`` its budgeted share. 4× is a
    conservative default; tune to the probe latency SLO. Empty lists
    are reported too (they waste nprobe slots without contributing
    candidates — the complementary drift direction).
    """
    k = spark.read.parquet(f"{index_path}/centroids").count()
    sizes = {
        r["cid"]: r["size"]
        for r in spark.read.parquet(f"{index_path}/lists")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("size"))
        .collect()
    }
    per_list = [int(sizes.get(c, 0)) for c in range(k)]
    n = sum(per_list)
    mean = n / k if k else 0.0
    largest = max(per_list) if per_list else 0
    skew = (largest / mean) if mean else 0.0
    return {
        "n_vectors": n,
        "k_centroids": k,
        "list_sizes": per_list,
        "largest_list": largest,
        "mean_list": mean,
        "empty_lists": sum(1 for s in per_list if s == 0),
        "skew": skew,
        "needs_retrain": bool(mean and skew > skew_threshold),
    }
