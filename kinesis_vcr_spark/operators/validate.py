"""Declarative data-quality expectations — the contract gate a corpus
passes before training jobs are allowed to read it.

A rule set compiles to ONE aggregation pass: every rule becomes a
conditional-sum column (uniqueness becomes ``count - count_distinct``),
so checking 20 expectations costs the same scan as checking one — at
100 TB the scan IS the budget, and a rule engine that runs one job per
rule is unusable. The wide 1-row result unpivots to one row per rule
(same shape discipline as operators/profile.py).

Rule kinds:

- ``not_null``        — column has no NULLs
- ``unique``          — column values are distinct (exact here;
                        swap approx_count_distinct at scale for a
                        probabilistic gate)
- ``in_range``        — lo ≤ value < hi (either bound optional)
- ``in_set``          — value ∈ allowed literals
- ``matches``         — value RLIKE pattern (nulls count as violations)
- ``expr``            — arbitrary boolean SQL over the row; rows where
                        it is false/null violate

Violations are COUNTED, never dropped — the report is the artifact;
enforcement policy (fail the pipeline, quarantine, alert) stays with
the caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = ()
    pattern: str | None = None
    sql: str | None = None
    params: dict = field(default_factory=dict)


def expect_not_null(column: str) -> Expectation:
    return Expectation(f"{column}_not_null", "not_null", column)


def expect_unique(column: str) -> Expectation:
    return Expectation(f"{column}_unique", "unique", column)


def expect_in_range(
    column: str, lo: float | None = None, hi: float | None = None
) -> Expectation:
    return Expectation(f"{column}_in_range", "in_range", column, lo=lo, hi=hi)


def expect_in_set(column: str, allowed) -> Expectation:
    return Expectation(
        f"{column}_in_set", "in_set", column, allowed=tuple(allowed)
    )


def expect_matches(column: str, pattern: str) -> Expectation:
    return Expectation(
        f"{column}_matches", "matches", column, pattern=pattern
    )


def expect_expr(name: str, sql: str) -> Expectation:
    return Expectation(name, "expr", sql=sql)


def _violation_condition(e: Expectation) -> Column:
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_range":
        cond = F.lit(False)
        if e.lo is not None:
            cond = cond | (c < F.lit(e.lo))
        if e.hi is not None:
            cond = cond | (c >= F.lit(e.hi))
        return c.isNull() | cond
    if e.kind == "in_set":
        return c.isNull() | ~c.isin(*e.allowed)
    if e.kind == "matches":
        return c.isNull() | ~c.rlike(e.pattern)
    if e.kind == "expr":
        ok = F.expr(e.sql)
        return ok.isNull() | ~ok
    raise ValueError(f"unknown expectation kind: {e.kind}")


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One-pass report: ``(rule, violations, n_rows, passed)`` — one row
    per expectation, rule order preserved via an explicit sort key.
    """
    if not expectations:
        raise ValueError("no expectations given")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in {names}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in expectations:
        if e.kind == "unique":
            aggs.append(
                (
                    F.count(e.column) - F.count_distinct(F.col(e.column))
                ).alias(e.name)
            )
        else:
            aggs.append(
                F.sum(
                    F.when(_violation_condition(e), 1).otherwise(0)
                ).alias(e.name)
            )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return (
        wide.select(
            F.col("__n"),
            F.expr(
                f"stack({len(names)}, {stack_args}) AS (rule, violations)"
            ),
        )
        .select(
            "rule",
            # an EMPTY input makes every conditional sum NULL — an empty
            # dataset violates nothing, and a NULL `passed` would slip
            # through both `passed` and `~passed` enforcement filters
            F.coalesce(F.col("violations").cast("long"), F.lit(0)).alias(
                "violations"
            ),
            F.col("__n").alias("n_rows"),
            (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias(
                "passed"
            ),
        )
    )
