"""Skew-safe top-k per group — the scale path for window-rank top-k.

The idiomatic Spark top-k (``row_number() OVER (PARTITION BY key ORDER
BY ...) <= k``) shuffles EVERY row of a key onto one task and sorts it
there. At 100 TB a hot key (one event type with 10^10 rows, one
boilerplate domain) serializes the whole stage through a single reducer
and can exceed executor memory outright. AQE cannot split a window
partition — unlike joins/aggs, window functions require all rows of a
partition on one task, so skew here needs a plan change, not a runtime
re-plan.

Two-phase refinement fixes it (same shape as combiner-based top-k in
MapReduce and the salted aggregation in ``operators/skew.py``):

1. **Salted local top-k** — append a uniform salt to the partition key
   and take the top-k of each (key, salt) slice. The shuffle carries
   the same total volume as the naive plan but spreads each hot key
   over ``salt_factor`` tasks, and each task sorts + truncates its
   slice to k rows immediately.
2. **Global refine** — top-k over the survivors, at most
   ``salt_factor * k`` rows per key, a trivially small window.

Any row in the true global top-k of its key is in the top-k of
whichever salt slice it landed in (rows absent from a slice's top-k
are beaten by >= k rows in that slice alone), so phase 2 sees every
answer row: the refinement is EXACT for any k, any salt assignment.

Determinism: pass a total order (include a unique tiebreak column in
``order_by``) and the result is oracle-exact; ties at the boundary
with a partial order are resolved arbitrarily, as in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_factor: int = 16,
    rank_col: str | None = None,
) -> DataFrame:
    """At most ``k`` rows per distinct ``key_cols`` group, the first k
    under ``order_by`` (e.g. ``[F.col("n").desc(), F.col("id")]``).
    Output = input columns, plus the 1-based rank as ``rank_col`` if
    requested.

    ``salt_factor`` bounds per-task work in phase 1: each task handles
    ~1/salt_factor of a hot key and keeps k rows of it. Raise it when
    a single key's rows exceed what one task should sort; it never
    affects the result.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")

    out_cols = list(df.columns)
    # Row→salt assignment only affects load balance, never the result
    # (phase 2 re-ranks globally), so any cheap spreader works.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(salt_factor),
    ).cast("int")
    local = Window.partitionBy(*key_cols, "__salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__r", F.row_number().over(local))
        .where(F.col("__r") <= k)
        .drop("__salt", "__r")
    )
    final = Window.partitionBy(*key_cols).orderBy(*order_by)
    ranked = survivors.withColumn("__r", F.row_number().over(final)).where(
        F.col("__r") <= k
    )
    if rank_col is None:
        return ranked.select(*out_cols)
    return ranked.select(*out_cols, F.col("__r").alias(rank_col))
