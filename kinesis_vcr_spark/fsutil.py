"""Filesystem-probe helper shared by the persisted-index operators.

``spark.read.parquet`` on a missing path raises AnalysisException —
which the index operators handle (first build of an index is a normal
event), but the JVM logs the full stack trace to stderr before Python
ever sees the exception, polluting bench/driver logs with scary py4j
frames for a non-error. Probing existence through the Hadoop
FileSystem API first is silent, costs one NameNode/S3 HEAD round-trip,
and works for any scheme Spark itself can read (local, HDFS, s3a).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its Hadoop filesystem (quiet — no
    exception, no JVM stack-trace logging)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))
