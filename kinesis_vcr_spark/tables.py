"""Loaders for the synthetic test tables (TESTDATA.md / FIXTURES.md §3).

Centralizes two environment quirks so every query sees clean schemas
regardless of which SparkSession it runs under (the correctness driver
supplies its own session, so these confs are (re)applied at load time):

- ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
  Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
  via ``spark.sql.legacy.parquet.nanosAsLong`` and expose BOTH the exact
  ``ts_ns`` long (for boundary-exact filtering) and a microsecond
  ``ts`` TimestampType (for date math / windows).
- base64 must be RFC-4648 unchunked to match java.util.Base64 and
  DuckDB's ``to_base64`` (``spark.sql.chunkBase64String.enabled=false``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _apply_session_quirks(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.chunkBase64String.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with normalized schema.

    ``events.ts`` has shipped in two physical forms across driver
    testdata generations — parquet TIMESTAMP(NANOS) (read as int64 via
    ``nanosAsLong``) and parquet timestamp[us] (read as TIMESTAMP_NTZ).
    Both normalize to the same exposed pair: exact int64 ``ts_ns``
    (boundary-exact filtering; DuckDB oracles use ``epoch_ns(ts)``)
    plus a microsecond TimestampType ``ts`` for calendar operations.
    """
    _apply_session_quirks(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            # nanosAsLong left ts as int64 nanos.
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        else:
            # timestamp[us] storage; session tz is pinned UTC, so the
            # NTZ→TZ cast is wall-clock-identical on every executor.
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
