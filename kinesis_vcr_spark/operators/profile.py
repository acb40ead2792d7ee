"""Table profiling — the ANALYZE-style data-quality audit.

Before a 100 TB corpus feeds anything, someone asks: how many nulls
per column, how many distinct values, what's the range? This is the
data-contract check that catches a broken upstream export (a column
suddenly 80% null, an id range that doubled) before training does.

One aggregation pass produces every column's profile — null counts
and min/max are plain aggregates; distinct counts are either exact
(``count(DISTINCT c)`` — Spark plans all of them in a single pass via
Expand, one scan total) or HLL-approximate (``approx_count_distinct``,
the 100 TB default where an exact per-column distinct would shuffle
the world). The wide 1-row result unpivots driver-side into one tidy
row per column.

Numeric min/max are reported as 6-dp-rounded DOUBLEs and string-typed
columns as raw strings, in SEPARATE columns — stringifying a double is
engine-specific ('1.0E-4' vs '0.0001') and would poison oracle
comparison, so the schema keeps numbers numeric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str)``. ``exact_distinct=False``
    switches to ``approx_count_distinct`` (the at-scale default)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}")
            )
        if isinstance(schema[c], _NUMERIC):
            aggs.append(
                F.round(F.min(c).cast("double"), 6).alias(f"__min_{c}")
            )
            aggs.append(
                F.round(F.max(c).cast("double"), 6).alias(f"__max_{c}")
            )
        elif dtypes[c] == "string":
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    def _entry(c: str) -> F.Column:
        numeric = isinstance(schema[c], _NUMERIC)
        stringy = dtypes[c] == "string"
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"__min_{c}") if stringy else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"__max_{c}") if stringy else F.lit(None).cast("string")).alias("max_str"),
        )

    return (
        wide.select(
            F.explode(F.array(*[_entry(c) for c in cols])).alias("p")
        )
        .select("p.*")
    )
