"""Z-order clustered layout (operators/layout.py): Morton-key
correctness on known bit patterns, multi-column per-file locality vs a
single-column sort, and string/NULL/constant-column handling."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def _file_ranges(spark, path, col):
    """Per-file (max-min) spans of ``col`` after reading ``path``."""
    df = spark.read.parquet(path)
    rows = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return [r["span"] for r in rows]


def test_morton_interleave_known_values(spark):
    # 2 cols x 2 bits over domain 0..3: bins == values, and
    # z(x, y) must interleave bits as y<<1 | x per bit position.
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], ["x", "y"]
    )
    out = df.withColumn("z", zorder_key(df, ["x", "y"], bits_per_col=2))
    got = {(r["x"], r["y"]): r["z"] for r in out.collect()}

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {
        (x, y): morton(x, y) for x in range(4) for y in range(4)
    }


@pytest.fixture(scope="module")
def grid(spark):
    # two independent uniform dimensions, 64x64 grid x 4 rows each
    return (
        spark.range(16384)
        .select(
            (F.col("id") % 64).alias("a"),
            ((F.col("id") / 64).cast("long") % 64).alias("b"),
        )
        .localCheckpoint()
    )


def test_zorder_beats_single_column_sort_on_second_column(spark, grid):
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        z_path, s_path = f"{tmp}/z", f"{tmp}/s"
        write_zordered(grid, z_path, ["a", "b"], num_files=16)
        (
            grid.repartitionByRange(16, "a")
            .sortWithinPartitions("a")
            .write.mode("overwrite")
            .parquet(s_path)
        )
        z_a = _file_ranges(spark, z_path, "a")
        z_b = _file_ranges(spark, z_path, "b")
        s_b = _file_ranges(spark, s_path, "b")
        # single-column sort leaves b unclustered: full 0..63 span/file
        assert sum(s_b) / len(s_b) > 55
        # z-order keeps BOTH columns clustered: 16 files tile a 64x64
        # grid into ~16x16 quadrants
        assert sum(z_a) / len(z_a) < 32
        assert sum(z_b) / len(z_b) < 32
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_string_column_prefix_order(spark):
    df = spark.createDataFrame(
        [("apple",), ("apricot",), ("zebra",), ("zoo",), (None,)],
        ["s"],
    )
    out = df.withColumn(
        "z", zorder_key(df, ["s"], bits_per_col=8)
    ).collect()
    z = {r["s"]: r["z"] for r in out}
    # lexicographic neighbours bin near each other; far words bin far
    assert abs(z["apple"] - z["apricot"]) < abs(z["apple"] - z["zebra"])
    assert z[None] == 0  # NULL clusters at the curve origin


def test_constant_column_contributes_nothing(spark):
    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], ["v", "const"])
    with_const = df.withColumn(
        "z", zorder_key(df, ["v", "const"], bits_per_col=4)
    )
    only_v = df.withColumn("z", zorder_key(df, ["v"], bits_per_col=4))
    # const col (min==max) is skipped; v's bits land at stride 2 vs 1
    zc = [r["z"] for r in with_const.orderBy("v").collect()]
    zv = [r["z"] for r in only_v.orderBy("v").collect()]
    assert zc == sorted(zc) and zv == sorted(zv)


def test_bit_budget_guard(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c", "d"], bits_per_col=16)
    with pytest.raises(ValueError):
        zorder_key(df, [], bits_per_col=8)
