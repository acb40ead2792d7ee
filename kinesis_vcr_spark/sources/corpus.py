"""Corpus ingestion sources — JSONL / CSV / parquet with quarantine.

The reference engine reads exactly one format (its own base64 text
archive, :mod:`kinesis_vcr_spark.sources.archive`); a training-data
pipeline ingests whatever the upstream crawl emits — JSONL (possibly
gzipped; Spark decompresses ``.gz`` transparently), CSV, parquet. The
operational difference at 100 TB is not parsing, which Spark's readers
already distribute, but *accounting*: a malformed line must neither
kill a 6-hour job (FAILFAST) nor vanish silently (DROPMALFORMED).

The pattern here is PERMISSIVE + an explicit quarantine split: corrupt
records land in a side DataFrame with their raw text, clean rows come
out typed, and both sides stay lazily evaluated — the split is two
filters over one scan, not two scans. An explicit ``schema`` is
required: schema inference triggers an extra full pass over 100 TB
and silently widens types between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """One JSON document per line (the corpus interchange standard),
    PERMISSIVE with the raw text of every malformed line captured in
    ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with the same quarantine contract as :func:`read_jsonl`."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows typed without the corrupt
    column; quarantined rows as ``(raw)`` — the raw text to log,
    re-parse, or count.

    Spark refuses plans whose file-referenced columns are ONLY the
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column pruning
    would otherwise skip the very parse that populates it), so the
    parsed frame is cached here: both sides then read one
    materialization. At 100 TB prefer the two-step shape instead —
    land the PERMISSIVE parse as parquet once, derive clean/quarantine
    from that — and keep this in-memory split for interactive or
    per-partition-sized loads; ``unpersist()`` either side's parent
    when done.
    """
    cached = df.cache()
    clean = cached.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return clean, bad


def ingest_report(df: DataFrame) -> DataFrame:
    """1-row ingest audit: ``n_clean, n_quarantined`` — the number a
    100 TB load MUST surface before anyone trains on the output.
    Same caching note as :func:`split_quarantine`."""
    return df.cache().agg(
        F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias("n_clean"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
    )
