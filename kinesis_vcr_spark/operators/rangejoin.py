"""Bucketed interval join — point-in-interval joins as equi-joins.

Spark has no range-join strategy: ``points JOIN intervals ON p BETWEEN
s AND e`` with no equi-key plans as BroadcastNestedLoopJoin — O(N·M)
comparisons, a non-starter when both sides are large. The standard fix
(Databricks' range-join optimization, DB2's grid join) is binning:
slice the domain into fixed-width buckets, explode each interval to the
buckets it covers, tag each point with its single bucket, equi-join on
the bucket id, then re-check the exact predicate.

Each qualifying (point, interval) pair meets in EXACTLY one bucket (the
point's), so no post-join dedup is needed — the bucket join is a strict
superset filtered by the exact predicate.

Scale posture:

- The join becomes a hash/sort-merge equi-join on ``__bucket`` (or a
  broadcast join when the exploded interval side is small) — shuffle
  volume = points + exploded intervals, never N·M.
- ``bucket_width`` trades explode factor against candidate density:
  pick it near the median interval length so intervals explode to ~2
  buckets while each point meets few candidate intervals. Long-tail
  intervals are guarded by ``max_buckets_per_interval`` (fail fast
  instead of a silent 10^6-row explode).
- An optional equi-key list co-partitions both sides on (keys, bucket),
  the common "same user, time contained" case.
- Bucket ids use exact integer ``div`` (int64 nanos ≈ 1.7e18 would
  round in a double ``floor(x / w)`` — above 2^53 that corrupts
  bucket boundaries).

Works on any NON-NEGATIVE integer domain (``div`` truncates toward
zero, which equals floor only for non-negatives); callers convert
timestamps to epoch integers (the query layer uses exact int64 nanos).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def _bucket_of(col: str, width: int, offset: int = 0) -> Column:
    """Exact int64 bucket id: ``(col + offset) div width``."""
    return F.expr(f"(CAST(`{col}` AS BIGINT) + ({offset})) div {width}")


def _explode_buckets(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
    max_buckets_per_interval: int | None,
) -> DataFrame:
    s, e = F.col(start_col), F.col(end_col)
    first = _bucket_of(start_col, bucket_width)
    last = _bucket_of(end_col, bucket_width, offset=-1)  # end is exclusive
    if max_buckets_per_interval is not None:
        span = last - first + 1
        last = F.when(
            span > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval spans more than {max_buckets_per_interval} "
                        f"buckets of width {bucket_width}; widen bucket_width "
                        "or raise max_buckets_per_interval (interval start: "
                    ),
                    s.cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(last)
    return intervals.where(s < e).withColumn(
        _BUCKET, F.explode(F.sequence(first, last))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
    max_buckets_per_interval: int = 4096,
    broadcast_intervals: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start_col, end_col)`` half-open range contains ``point_col``
    (plus optional ``on`` equi-keys). Column sets must be disjoint
    apart from ``on``; bound columns must be non-negative integers,
    non-null on the interval side.

    ``broadcast_intervals=True`` broadcasts the exploded interval side
    — the right call when intervals are small (campaign windows,
    maintenance windows) and the point side is the 100 TB one: the
    point scan then never shuffles at all.

    ``num_partitions`` pins the join's parallelism. Set it when the
    join OUTPUT is much larger than its inputs (dense domains: many
    points per bucket × many intervals per bucket): AQE sizes the
    post-shuffle stage from input bytes only, so a few-MB input can
    coalesce to a handful of tasks that then each produce tens of
    millions of joined rows (measured in the r05 sf1.0 scale run:
    5 tasks, 110 M output rows, 81 s → 32 tasks, 23 s). An explicit
    user repartition on the join keys survives AQE coalescing and
    both sides share the partitioning, so the join adds no extra
    exchange.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    on = on or []
    exploded = _explode_buckets(
        intervals, start_col, end_col, bucket_width, max_buckets_per_interval
    )
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    tagged = points.withColumn(_BUCKET, _bucket_of(point_col, bucket_width))
    if num_partitions is not None:
        if broadcast_intervals:
            raise ValueError(
                "num_partitions only applies to the shuffle join path; "
                "drop it or broadcast_intervals"
            )
        keys = [*on, _BUCKET]
        exploded = exploded.repartition(num_partitions, *keys)
        tagged = tagged.repartition(num_partitions, *keys)
    p, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    joined = tagged.join(exploded, on=[*on, _BUCKET], how="inner")
    return joined.where((p >= s) & (p < e)).drop(_BUCKET)
