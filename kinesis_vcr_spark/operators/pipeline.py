"""End-to-end corpus-cleaning pipeline — the composed form of the
training-data preparation flow this engine exists for: exact dedup →
near-dup clustering → quality filtering, in one call, labeling every
document with its fate.

Stage order matters and mirrors production practice:

1. **exact dedup first** (cheapest: one window over a content key) — a
   boilerplate page duplicated 10^6 times must die here, BEFORE the
   LSH stage where it would form a mega-band (see the band-member cap
   in :mod:`kinesis_vcr_spark.operators.dedup`);
2. **near-dup clustering** over the exact survivors only: MinHash-LSH
   candidate pairs → connected components → keep the min-id root of
   each component;
3. **quality filter** over what remains.

Every stage is a DataFrame transformation (window / LSH joins / label
propagation / scalar scoring); nothing collects to the driver, so the
pipeline inherits each operator's 100 TB posture. Statuses are mutually
exclusive and assigned in stage order — a doc that is both a near-dup
and low quality reports ``dropped_near_dup``, matching the stage that
actually removed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUS_KEPT = "kept"
STATUS_EXACT = "dropped_exact"
STATUS_NEAR = "dropped_near_dup"
STATUS_QUALITY = "dropped_quality"


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.6,
    quality_threshold: float = 0.6,
    shingle_size: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """All ``docs`` columns + a ``status`` column:
    kept | dropped_exact | dropped_near_dup | dropped_quality.

    Deterministic: winners are min-id (per identical text, then per
    near-dup component), so any engine computing the same definition
    agrees row-for-row — the driver query's DuckDB oracle recomputes
    the whole pipeline relationally.
    """
    from kinesis_vcr_spark.functions.text import quality_score
    from kinesis_vcr_spark.operators.components import connected_components
    from kinesis_vcr_spark.operators.dedup import near_dup_pairs_minhash

    idc = F.col(id_col)
    # 1 — exact: min id per identical text wins (one shuffle on content)
    exact_w = docs.withColumn(
        "__exact_winner", F.min(idc).over(Window.partitionBy(text_col))
    )
    exact_kept = exact_w.where(idc == F.col("__exact_winner"))

    # 2 — near-dup among exact survivors: pairs -> components -> roots
    pairs = near_dup_pairs_minhash(
        exact_kept,
        id_col,
        text_col,
        shingle_size=shingle_size,
        threshold=jaccard_threshold,
    )
    comp = connected_components(
        pairs, "id_a", "id_b", checkpoint_dir=checkpoint_dir
    )
    near_drops = (
        comp.where(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
        .withColumn("__near_drop", F.lit(True))
    )

    labeled = exact_w.join(near_drops, id_col, "left")
    status = (
        F.when(idc != F.col("__exact_winner"), F.lit(STATUS_EXACT))
        .when(F.col("__near_drop"), F.lit(STATUS_NEAR))
        .when(
            quality_score(F.col(text_col)) < quality_threshold,
            F.lit(STATUS_QUALITY),
        )
        .otherwise(F.lit(STATUS_KEPT))
    )
    return labeled.select(*docs.columns, status.alias("status"))


def kept_corpus(docs: DataFrame, **kwargs) -> DataFrame:
    """Just the surviving documents — the pipeline's production output."""
    out = clean_corpus(docs, **kwargs)
    return out.where(F.col("status") == STATUS_KEPT).drop("status")
