"""Embedding quantization — int8 compression for vector columns.

At 100 TB an `array<float>` embedding column dominates storage and
ANN memory; per-dimension min-max int8 quantization cuts both 4× with
bounded reconstruction error (≤ range/510 per dimension) — the standard
scale path before IVF/LSH indexing (FAISS's scalar quantizer does
exactly this).

Two stages, both engine-portable:

- **fit**: per-dimension (min, max) over the corpus — one posexplode
  (narrow 1→dim flatMap) + one groupBy(dim) with map-side combine; the
  result is `dim` rows (64 here), broadcast-sized by construction.
- **apply**: codes = round((x − min) / (max − min) · 255) per element.
  Join the per-dim ranges (broadcast) onto exploded elements, or bake
  them into an `F.transform` literal array for the array-in/array-out
  form — both stay in whole-stage codegen, no Python.

Exactness discipline: elements are cast float→double (exact) before
arithmetic; reconstruction errors are summed as DECIMAL (exact,
order-independent) and only converted to double at the end — the
repo-wide hash-parity recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # int8 code points 0..255 (uint8 range)


def embedding_ranges(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (pos, vmin, vmax) — the quantizer's "model"."""
    return (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("vmin"),
            F.max(F.col("x").cast("double")).alias("vmax"),
        )
    )


def quantize_elements(
    df: DataFrame,
    ranges: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-level codes + reconstruction error: one row per
    (vector, dimension) with ``code`` (0..255) and ``abs_err``.
    The ranges join is an explicit broadcast — `dim` rows."""
    el = df.select(
        id_col, F.posexplode(vec_col).alias("pos", "xf")
    ).withColumn("x", F.col("xf").cast("double"))
    j = el.join(F.broadcast(ranges), "pos")
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(float(LEVELS))
    code = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.round((F.col("x") - F.col("vmin")) / scale).cast("int")
    )
    recon = F.col("vmin") + code.cast("double") * scale
    return j.select(
        id_col,
        "pos",
        code.alias("code"),
        F.abs(F.col("x") - recon).alias("abs_err"),
    )


def quantize_vectors(
    df: DataFrame,
    ranges_rows: list[tuple[int, float, float]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Array-in/array-out form: adds an ``array<int>`` codes column.

    ``ranges_rows`` = collected (pos, vmin, vmax) — dim-sized, the same
    accepted driver-side footprint as IVF centroids (operators/ivf.py).
    Pure `F.transform` over literal arrays: whole-stage codegen, no
    shuffle, no Python.
    """
    ordered = sorted(ranges_rows)
    mins = F.array(*[F.lit(float(v)) for _, v, _ in ordered])
    scales = F.array(
        *[
            F.lit((vmax - vmin) / float(LEVELS) if vmax > vmin else 1.0)
            for _, vmin, vmax in ordered
        ]
    )
    def _q(x, i):
        return F.round(
            (x.cast("double") - F.element_at(mins, i + 1))
            / F.element_at(scales, i + 1)
        ).cast("int")

    return df.withColumn(out_col, F.transform(F.col(vec_col), _q))
