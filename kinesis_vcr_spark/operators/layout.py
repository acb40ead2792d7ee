"""Z-order clustered file layout — multi-column locality for scan
pruning.

Parquet scan pruning works on per-file / per-row-group min-max stats:
a filter can skip a file only if the filtered column's values in that
file span a narrow range. Sorting the table by one column gives that
column perfect locality and leaves every other column's per-file range
at 100% of the domain. Z-ordering interleaves the bits of several
columns' bin ids into one clustering key, so each written file covers a
small hyper-rectangle of the combined space — filters on ANY prefix-
free subset of the clustered columns skip most files (the same layout
decision `OPTIMIZE ZORDER BY` makes in lakehouse engines, and the
classic UB-tree / Morton-curve technique).

At 100 TB this is a WRITE-TIME operator: pay one range shuffle when the
table lands, save it on every subsequent selective scan. The plan is

1. per column: one min/max aggregate, then ``width_bucket`` maps the
   value into ``2^bits_per_col`` equal-width bins (pure projection;
   equal-width keeps the bin expression O(1) per row — heavy skew in a
   clustered column degrades locality gracefully, never correctness);
   strings are binned on an order-preserving packed 7-byte prefix;
2. Morton-interleave the bin bits with shift/or arithmetic (JVM
   codegen, no UDF);
3. ``repartitionByRange`` on the z-key (sampled range boundaries →
   each output file = one contiguous z-range) + ``sortWithinPartitions``
   so row groups inside a file are tight too.

Rows where a clustered column is NULL get bin 0 (nulls cluster
together at the curve origin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PREFIX_CHARS = 7  # string prefix packed into 7×8 bits (< 2^53 safe)


def _orderable(df: DataFrame, col: str) -> Column:
    """An order-preserving numeric image of ``col`` (double).

    Numerics/dates/timestamps cast directly. Strings pack the first 7
    characters' code points (capped at 255) big-endian — preserves
    lexicographic order for ASCII/Latin prefixes, approximates it
    beyond (locality, not correctness, is at stake).
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.StringType):
        packed: Column = F.lit(0).cast("long")
        for i in range(1, _PREFIX_CHARS + 1):
            code = F.least(
                F.coalesce(F.ascii(F.substring(c, i, 1)), F.lit(0)),
                F.lit(255),
            )
            packed = packed * 256 + code
        return packed.cast("double")
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def zorder_key(
    df: DataFrame, cluster_cols: list[str], bits_per_col: int = 8
) -> Column:
    """The Morton (z-curve) key over ``cluster_cols`` as a LONG column
    expression. ``len(cluster_cols) * bits_per_col`` must fit in 62
    bits. Requires one tiny min/max aggregate per call (O(cols)
    scalars to the driver, folded into the expression as literals)."""
    n = len(cluster_cols)
    if n < 1:
        raise ValueError("cluster_cols must be non-empty")
    if n * bits_per_col > 62:
        raise ValueError(
            f"{n} cols x {bits_per_col} bits = {n * bits_per_col} bits "
            "> 62; lower bits_per_col"
        )
    nbins = 1 << bits_per_col
    stats = df.select(
        *[
            f
            for c in cluster_cols
            for f in (
                F.min(_orderable(df, c)).alias(f"min_{c}"),
                F.max(_orderable(df, c)).alias(f"max_{c}"),
            )
        ]
    ).first()

    z: Column = F.lit(0).cast("long")
    for j, c in enumerate(cluster_cols):
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or hi <= lo:  # constant/all-null col
            continue
        bin_id = (
            F.width_bucket(
                _orderable(df, c), F.lit(lo), F.lit(hi), F.lit(nbins)
            )
            - 1
        )
        # width_bucket: value==hi lands in bin nbins (overflow) → clamp;
        # NULL value → NULL bucket → bin 0.
        bin_id = F.coalesce(
            F.least(F.greatest(bin_id, F.lit(0)), F.lit(nbins - 1)),
            F.lit(0),
        ).cast("long")
        for i in range(bits_per_col):
            bit = F.shiftright(bin_id, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 64,
    bits_per_col: int = 8,
) -> None:
    """Write ``df`` as parquet at ``path``, clustered into
    ``num_files`` z-ordered files. One range shuffle (sampled z
    boundaries — contiguous, balanced z-ranges per file); rows sorted
    by z within each file for row-group-level stats too."""
    z = zorder_key(df, cluster_cols, bits_per_col)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
