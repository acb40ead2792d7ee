"""Bucketed tables — shuffle-free co-located joins and aggregations.

The single biggest shuffle eliminator for a 100 TB star/fact layout:
write each side ``bucketBy(n, key)`` once, and every subsequent
equi-join or aggregation on that key reads both sides already
hash-partitioned — the sort-merge join happens bucket-to-bucket with
NO Exchange in the plan (pinned in tests/test_bucketing.py). Amortized
over the many queries a curated corpus serves, the one-time bucketed
write is the cheapest shuffle you will ever run; it is how a
lineitem⋈orders-shaped join survives a 1000-executor cluster without
moving either table again.

Mechanics that matter (and are easy to get wrong):

- both sides must be bucketed INTO THE SAME BUCKET COUNT on the join
  key, or Spark falls back to a full exchange of the mismatched side
  (one-side-bucketed still halves the shuffle);
- ``sortBy`` within buckets lets the merge phase skip its sort when
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` honors it; we
  still write sorted files — cheap at write time, useful for scan-time
  min/max skipping regardless;
- bucket pruning: an equality filter on the bucket key scans 1/n of
  the files (Catalyst's BucketPruning rule) — visible as
  ``SelectedBucketsCount`` in the scan node;
- bucketed tables require the (session-local) catalog —
  ``saveAsTable``, not ``save``; the data itself is plain parquet in
  the warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table: parquet files
    hash-partitioned into ``n_buckets`` by ``bucket_cols`` (and sorted
    within each bucket by ``sort_cols``, defaulting to the bucket
    key). This is the one shuffle this data pays on its join key."""
    sort_cols = sort_cols or bucket_cols
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (a path-based
    ``spark.read.parquet`` of the same files loses the bucket spec and
    re-shuffles on the next join)."""
    return spark.table(table)


def co_located_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key —
    bucket-to-bucket, no Exchange on either side (the plan shape is
    pinned in tests/test_bucketing.py; a mismatched bucket count or a
    non-catalog read silently degrades to a shuffle, which is exactly
    why this helper reads through the catalog)."""
    return read_bucketed(spark, left).join(
        read_bucketed(spark, right), on=on, how=how
    )
