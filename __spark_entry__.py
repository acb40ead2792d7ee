"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`kinesis_vcr_spark.queries` as
:class:`QuerySpec` entries (spark_fn + DuckDB oracle, aliased to
identical column names on both sides); this module just adapts the
registry to the driver's three-function shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Q1-style pricing summary: the scan + partial-agg + decimal-math
    codegen hot path (SURVEY.md §7.2 step 6).
    """
    from kinesis_vcr_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kinesis_vcr_spark.queries import all_queries

    return {name: spec.spark_fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted where the op is not
    SQL-expressible — driver records a rows-only check for those)."""
    from kinesis_vcr_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
