"""Parametric OPQ-lite: PCA rotation + eigenvalue-balanced subspace
permutation for product quantization.

Product quantization (operators/pq.py) splits the embedding into m
contiguous coordinate blocks and quantizes each independently — which
silently assumes the coordinates are decorrelated and the variance is
spread evenly across blocks. Real encoder embeddings violate both.
The parametric fix from the OPQ literature (Ge et al., CVPR 2013 —
"Optimized Product Quantization", the non-iterative variant): rotate
into the eigenbasis of the second-moment matrix (decorrelates
coordinates), then PERMUTE dimensions so each of the m blocks receives
a balanced share of the spectrum (greedy: next-largest eigenvalue goes
to the block with the smallest running log-variance product). The
combined map is one orthogonal matrix R; inner products and norms are
EXACTLY preserved (⟨Rx, Ry⟩ = ⟨x, y⟩), so the exact top-k is unchanged
— only the quantizer's subspace distortion improves.

Scale shape: fitting R is the operators/pca.py Gram reduction (one
scan, constant-size shuffle) + an O(d³) driver-side eigh; applying R
is one Arrow-batched matmul per batch with the (d×d ≤ 32 KB) matrix
riding the task closure — no join, no shuffle. Training/encoding/ADC
then proceed on the rotated column with the UNCHANGED pq.py machinery.

Uncentered second moment, not covariance: PQ here quantizes UNIT
vectors for inner-product search, and rotation must commute with the
normalization (centering would not: ⟨x−μ, y−μ⟩ ≠ ⟨x, y⟩).

No reference counterpart; additive engine layer over E62/E109.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.pca import (
    DEFAULT_SCALE,
    component_sums,
    gramian_partial_pandas,
    quantize_embeddings,
)


def second_moment(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
) -> np.ndarray:
    """E[x xᵀ] (uncentered, population) from the distributed exact-int
    Gram reduction — d² floats collected, data stays on executors."""
    q = quantize_embeddings(df, col, scale).select("q")
    gram_rows = gramian_partial_pandas(q, "q", dim).collect()
    n_rows = component_sums(q, "q", dim).select("n").first()
    if n_rows is None:
        raise ValueError("second_moment: empty input")
    n = n_rows["n"]
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = float(r["s_ij"])
        g[r["j"] - 1, r["i"] - 1] = float(r["s_ij"])
    return g / n / (float(scale) * float(scale))


def balanced_assignment(eigvals: np.ndarray, m: int) -> np.ndarray:
    """Greedy eigenvalue allocation: descending eigenvalues, each to the
    block with the smallest running log-variance product (Ge et al. §4's
    balance criterion). Returns ``perm`` such that rotated dimension
    ``perm[k]`` lands in output slot ``k``, blocks contiguous.

    Deterministic: ties go to the lowest block index; every block gets
    exactly d/m dimensions.
    """
    d = len(eigvals)
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    per = d // m
    order = np.argsort(-eigvals, kind="stable")
    log_prod = np.zeros(m)
    counts = np.zeros(m, dtype=int)
    blocks: list[list[int]] = [[] for _ in range(m)]
    eps = 1e-12
    for idx in order:
        open_blocks = [b for b in range(m) if counts[b] < per]
        b = min(open_blocks, key=lambda b: (log_prod[b], b))
        blocks[b].append(int(idx))
        log_prod[b] += float(np.log(max(eigvals[idx], eps)))
        counts[b] += 1
    return np.array([i for blk in blocks for i in blk], dtype=int)


def opq_rotation(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    scale: int = DEFAULT_SCALE,
) -> np.ndarray:
    """Fit the (d×d) orthogonal OPQ-lite matrix R: eigenbasis of the
    second moment, rows permuted by the balanced assignment. Apply as
    ``y = R x`` (:func:`rotate_vectors`)."""
    g = second_moment(df, col, dim, scale)
    eigvals, eigvecs = np.linalg.eigh(g)  # ascending
    desc = np.argsort(-eigvals, kind="stable")
    eigvals = eigvals[desc]
    basis = eigvecs[:, desc].T  # row k = k-th principal direction
    # deterministic sign (eigh's is arbitrary): largest-|coord| positive
    for row in basis:
        pivot = int(np.argmax(np.abs(row)))
        if row[pivot] < 0:
            row *= -1.0
    perm = balanced_assignment(eigvals, m)
    return np.ascontiguousarray(basis[perm])


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    col: str = "embedding",
    out: str = "rotated",
) -> DataFrame:
    """``out = R · col`` per row — one Arrow-batched matmul, the d×d
    matrix rides the closure; float64 output so downstream PQ training
    sees full precision."""
    r_t = np.ascontiguousarray(rotation.T, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def rot(s: pd.Series) -> pd.Series:
        x = np.array(s.to_list(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype=object)
        return pd.Series(list(x @ r_t))

    return df.withColumn(out, rot(F.col(col)))


def _cross_moment(
    df: DataFrame,
    rotation: np.ndarray,
    codebook: np.ndarray,
    col: str = "embedding",
) -> np.ndarray:
    """M = Σ x·x̂ᵀ over UNIT vectors x (original space) and their
    quantized reconstructions x̂ = R⁻¹·decode(encode(R x)) pulled back
    to the original space... equivalently, accumulate in ROTATED space
    and conjugate: here we keep x in original coordinates and x̂R in
    rotated coordinates, so M = Σ x·(decode(encode(R x)))ᵀ and the
    Procrustes solve below yields the NEW rotation directly (no
    pull-back needed). Distributed one-scan reduction: per Arrow batch
    a d×d float partial, flattened to d² rows, summed by a tiny hash
    agg. Float (not exact-int) on purpose — this is a FITTING
    reduction like train_pq's Lloyd means, not an oracle surface."""
    from kinesis_vcr_spark.operators.ivf import _normalize_rows  # noqa: PLC2701
    from kinesis_vcr_spark.operators.pq import (  # noqa: PLC2701
        _encode_batch,
        pq_decode,
    )

    r = np.ascontiguousarray(rotation, dtype=np.float64)
    cb = codebook
    dim = r.shape[0]

    def emit(batches):
        for pdf in batches:
            x = np.array(pdf[col].to_list(), dtype=np.float64)
            if x.size == 0:
                continue
            x = _normalize_rows(x)
            y = x @ r.T  # rotated
            rec = pq_decode(_encode_batch(y, cb), cb)
            part = x.T @ rec  # d × d
            iu, ju = np.meshgrid(range(dim), range(dim), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": iu.ravel(),
                    "j": ju.ravel(),
                    "v": part.ravel(),
                }
            )

    rows = (
        df.select(col)
        .mapInPandas(emit, schema="i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    m_mat = np.zeros((dim, dim), dtype=np.float64)
    for row in rows:
        m_mat[row["i"], row["j"]] = row["v"]
    return m_mat


def quantization_mse(
    df: DataFrame,
    rotation: np.ndarray,
    codebook: np.ndarray,
    col: str = "embedding",
) -> float:
    """Mean ||R x − decode(encode(R x))||² over unit vectors — the OPQ
    objective, measured distributed (one scan, scalar out)."""
    from kinesis_vcr_spark.operators.ivf import _normalize_rows  # noqa: PLC2701
    from kinesis_vcr_spark.operators.pq import (  # noqa: PLC2701
        _encode_batch,
        pq_decode,
    )

    r = np.ascontiguousarray(rotation, dtype=np.float64)
    cb = codebook

    def emit(batches):
        for pdf in batches:
            x = np.array(pdf[col].to_list(), dtype=np.float64)
            if x.size == 0:
                continue
            y = _normalize_rows(x) @ r.T
            rec = pq_decode(_encode_batch(y, cb), cb)
            err = np.sum((y - rec) ** 2, axis=1)
            yield pd.DataFrame({"s": [float(err.sum())], "n": [len(err)]})

    agg = (
        df.select(col)
        .mapInPandas(emit, schema="s double, n long")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .first()
    )
    return float(agg["s"]) / float(agg["n"]) if agg["n"] else 0.0


def opq_refine(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 3,
    scale: int = DEFAULT_SCALE,
    id_col: str = "vec_id",
):
    """Full (non-parametric) OPQ alternation, Ge et al. §3: starting
    from the parametric rotation, alternate (a) fix R → retrain the PQ
    codebook on the rotated data, (b) fix the codebook → update R by
    orthogonal Procrustes against the reconstructions
    (maximize tr(R·M), M = Σ x·x̂ᵀ ⇒ R = V·Uᵀ from M = U·S·Vᵀ).

    Returns ``(rotation, codebook, mse_history)`` — a CONSISTENT pair:
    the codebook was trained under the returned rotation, and
    ``history[-1]`` is exactly that pair's objective. The Procrustes
    update therefore runs at the TOP of iterations 2..n (against the
    previous pair), never after the last retrain. History holds the
    objective after each (a) step; callers assert/monitor descent.
    Each iteration = two one-scan reductions + a driver-side d×d SVD;
    the corpus never shuffles.
    """
    from kinesis_vcr_spark.operators.pq import train_pq  # noqa: PLC0415

    r = opq_rotation(df, col, dim=dim, m=m, scale=scale)
    history: list[float] = []
    cb = None
    for _ in range(iterations):
        if cb is not None:
            m_mat = _cross_moment(df, r, cb, col)
            u, _, vt = np.linalg.svd(m_mat)
            # maximize tr(R·M): R = V·Uᵀ (M = U S Vᵀ ⇒ R M = V S Vᵀ ⪰ 0)
            r = vt.T @ u.T
        rotated = rotate_vectors(df, r, col, "rotated")
        cb = train_pq(
            rotated, m=m, ksub=ksub, id_col=id_col, vec_col="rotated",
            refine_iterations=1,
        )
        history.append(quantization_mse(df, r, cb, col))
    return r, cb, history


__all__ = [
    "balanced_assignment",
    "opq_refine",
    "opq_rotation",
    "quantization_mse",
    "rotate_vectors",
    "second_moment",
]
