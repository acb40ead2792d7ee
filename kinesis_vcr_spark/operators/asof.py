"""As-of join — an operator Spark lacks natively (guide: "As-of / range
join"), built as a composition of built-in ops so it scales.

Semantics: for each left row, attach the single right row with the
largest ``right_ts <= left_ts`` (direction="backward", the default —
``pd.merge_asof`` / DuckDB ``ASOF JOIN`` semantics) or the smallest
``right_ts >= left_ts`` (direction="forward") within the same key;
exact matches allowed in both directions. An optional ``tolerance``
nulls matches farther than the given distance — full
``pd.merge_asof(direction=..., tolerance=...)`` parity.

Implementation is the union+window form, NOT a per-group
``applyInPandas``: one shuffle on the key, one sort within partitions,
then ``last(..., ignorenulls=True)`` over an unbounded-preceding window
(order reversed for forward). At 100 TB this is exactly the plan you
want — no Python in the hot path, no cross join, skew handled by AQE; a
merge_asof-in-pandas variant would serialize every row through Arrow
and cap each group at one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join with exact matches allowed.

    ``right`` must be unique per (on, right_ts) — pre-aggregate if not
    (ties would make the result nondeterministic in any engine).
    Returns all ``left`` columns plus ``right_value_cols`` (suffixed),
    null where no right row qualifies.

    ``tolerance`` is a max |left_ts − right_ts| in the ts columns' own
    units and requires NUMERIC timestamps (e.g. int64 nanos) — matches
    farther away are nulled, mirroring ``pd.merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_aliases = [f"{c}{suffix}" for c in right_value_cols]

    # Tag sides; at equal timestamps the right row must sort FIRST so the
    # running last() sees it (exact matches allowed). For forward as-of
    # the scan runs in descending time order, so "last seen" is the
    # nearest FOLLOWING right row.
    # All carried values travel in ONE struct so the running last() can
    # only ever pick up a whole right row. Filling each column with its
    # own last(col, ignorenulls=True) would backfill a NULL field of the
    # matched row from an OLDER right row — mixing columns from
    # different rows, diverging from pd.merge_asof (ADVICE r02).
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[
                F.col(c).alias(a)
                for c, a in zip(right_value_cols, value_aliases)
            ],
        ).alias("__rv"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
    )
    # missing columns (value cols on the left side, __left on the right
    # side) are null-filled by unionByName
    unioned = r.unionByName(l, allowMissingColumns=True)

    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "__side",
        "__ts",
        "__left",
        F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
    )
    out = filled.where(F.col("__side") == 1)
    if tolerance is not None:
        # __matched_ts comes from the same struct as the values, so the
        # tolerance check and the carried columns agree on the row
        within = (
            F.abs(F.col("__ts") - F.col("__rv.__matched_ts"))
            <= F.lit(tolerance)
        )
        out = out.withColumn(
            "__rv", F.when(within, F.col("__rv")).otherwise(F.lit(None))
        )
    return out.select(
        "__left.*",
        *[F.col(f"__rv.{a}").alias(a) for a in value_aliases],
    )
