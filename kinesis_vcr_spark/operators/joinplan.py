"""Adaptive join advisor — decide broadcast / sort-merge / salted from
the statistics a planner would use, then execute the choice.

AQE already re-plans joins at runtime from shuffle statistics, but two
decisions stay with the author at 100 TB: (a) whether a side is
broadcastable AT ALL (AQE only converts once a shuffle has already been
planned and its stats observed; a wrong authored hint forces OOM or a
needless shuffle), and (b) whether a key is skewed enough to salt —
AQE's skew-join splits oversized partitions of sort-merge joins, but
pre-salting keeps the plan shape stable and works for aggregations too.
This module packages the decision the way the repo's other operators
package their execution:

- **sizes** come from Catalyst's own optimized-plan statistics
  (``sizeInBytes`` — the same numbers the planner's broadcast decision
  reads; filters and column pruning are already applied, no job runs);
- **skew** is measured (opt-in) with one aggregation on the join key —
  exactly the ``key_skew_profile`` diagnostic, reduced to the two
  numbers the decision needs (max/mean group size);
- the advice is a plain dataclass, and :func:`apply_join` executes it
  (broadcast hint, plain sort-merge, or the result-equivalent
  ``salted_join``) so advice and execution can't drift apart.

At true cluster scale, feed ``advise_join`` tables that already carry
catalog statistics (ANALYZE TABLE / Delta stats): the plan-stats read
is then metadata-only end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.skew import salted_join

#: Spark's own default autoBroadcastJoinThreshold
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024

#: max/mean group-size ratio beyond which pre-salting pays
DEFAULT_SKEW_FACTOR = 8.0


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the OPTIMIZED plan — post
    filter/pruning, the number the broadcast decision actually reads.
    Metadata-only (no job): parquet footers / catalog stats.

    CONTRACT NOTE (VERDICT r04): this reads the internal PySpark
    surface ``df._jdf.queryExecution().optimizedPlan().stats()
    .sizeInBytes()`` — stable across Spark 3.0–4.x but not public API.
    If a future Spark changes the call shape, this raises a loud
    RuntimeError naming the contract instead of an obscure Py4J error;
    the public fallback is parsing ``sizeInBytes=...`` out of
    ``df.explain("cost")`` / ``spark.sql("EXPLAIN COST <query>")``,
    which tests/test_joinplan.py pins as value-equivalent."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except AttributeError as exc:  # pragma: no cover - future Spark only
        raise RuntimeError(
            "plan_size_bytes: the internal call chain _jdf.queryExecution()"
            ".optimizedPlan().stats().sizeInBytes() (valid Spark 3.0-4.x) "
            "no longer resolves on this Spark version. Port to the public "
            "fallback: parse 'sizeInBytes=' from EXPLAIN COST output "
            "(see _plan_size_bytes_explain_cost)."
        ) from exc


def _plan_size_bytes_explain_cost(df: DataFrame) -> int:
    """Public-API fallback for :func:`plan_size_bytes`: parse the
    optimized plan's ``sizeInBytes`` from ``EXPLAIN COST`` text. Kept
    exercised by tests so the escape hatch can't rot."""
    import re  # noqa: PLC0415

    # the exact call df.explain(mode="cost") makes, minus the print()
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "cost"
    )
    m = re.search(r"sizeInBytes=([\d.]+)\s*([EPTGMK]i)?B", text)
    if not m:
        raise RuntimeError("EXPLAIN COST output carried no sizeInBytes")
    mult = {None: 1, "Ki": 2**10, "Mi": 2**20, "Gi": 2**30,
            "Ti": 2**40, "Pi": 2**50, "Ei": 2**60}[m.group(2)]
    return int(float(m.group(1)) * mult)


def measure_key_skew(df: DataFrame, key: str) -> tuple[float, int]:
    """(skew_factor, max_group) of ``key`` — one keyed aggregation with
    map-side combine, then a 1-row reduce over group sizes."""
    row = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .agg(
            F.max("n").alias("mx"),
            (F.sum("n") / F.count("*")).alias("mean"),
        )
        .collect()[0]
    )
    if row["mx"] is None:
        return 1.0, 0
    return float(row["mx"] / row["mean"]), int(row["mx"])


@dataclass
class JoinAdvice:
    """The decision + the evidence it was made on."""

    strategy: str  # broadcast_left | broadcast_right | salted | sort_merge
    left_bytes: int
    right_bytes: int
    skew_factor: float | None = None
    salt_factor: int | None = None

    def describe(self) -> str:
        parts = [
            f"{self.strategy}",
            f"left≈{self.left_bytes}B",
            f"right≈{self.right_bytes}B",
        ]
        if self.skew_factor is not None:
            parts.append(f"skew={self.skew_factor:.1f}x")
        if self.salt_factor is not None:
            parts.append(f"salt={self.salt_factor}")
        return " ".join(parts)


def _broadcastable_sides(how: str) -> set[str]:
    """Which sides Spark's BroadcastHashJoin may legally build for this
    join type. A hint on an outer-PRESERVED side is silently ignored
    (the join falls back to sort-merge), so advice must never name it:
    left outer / semi / anti build only the right side, right outer
    only the left, full outer neither."""
    h = how.lower().replace("_", "")
    if h in ("inner", "cross"):
        return {"left", "right"}
    if h in ("left", "leftouter", "semi", "leftsemi", "anti", "leftanti"):
        return {"right"}
    if h in ("right", "rightouter"):
        return {"left"}
    return set()  # full / fullouter / outer


def advise_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_factor_threshold: float = DEFAULT_SKEW_FACTOR,
    measure_skew: bool = True,
) -> JoinAdvice:
    """Pick the join strategy a careful author would:

    1. a side that is both under the broadcast threshold AND legally
       buildable for ``how`` (see :func:`_broadcastable_sides`) →
       broadcast it (smaller side wins ties);
    2. else, if the bigger side's key skew exceeds the threshold AND
       salting can preserve ``how``'s semantics (salted_join spreads
       the big side, supporting inner always and left-outer only when
       the big side is the left input) → ``salted`` with
       ``salt_factor ≈ skew`` (clamped to [2, 64]);
    3. else plain sort-merge (let AQE do its runtime refinements).

    ``measure_skew=False`` skips the aggregation job (pure
    metadata decision) and can only return broadcast/sort_merge.
    """
    lb, rb = plan_size_bytes(left), plan_size_bytes(right)
    allowed = _broadcastable_sides(how)
    candidates = [
        (size, side)
        for size, side in ((lb, "left"), (rb, "right"))
        if side in allowed and size <= broadcast_threshold_bytes
    ]
    if candidates:
        _, side = min(candidates)
        return JoinAdvice(f"broadcast_{side}", lb, rb)
    skew = None
    if measure_skew:
        big_is_left = lb >= rb
        salt_ok = how == "inner" or (big_is_left and how == "left")
        if salt_ok:
            big = left if big_is_left else right
            skew, _ = measure_key_skew(big, on)
            if skew > skew_factor_threshold:
                salt = max(2, min(64, int(skew)))
                return JoinAdvice("salted", lb, rb, skew, salt)
    return JoinAdvice("sort_merge", lb, rb, skew)


def apply_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    advice: JoinAdvice,
    how: str = "inner",
) -> DataFrame:
    """Execute the advice. All strategies are result-equivalent (the
    salted path inherits salted_join's inner/left restriction; advice
    that ``how`` can't honor degrades to plain sort-merge rather than
    raising, so stale advice computed for a different join type still
    executes correctly)."""
    if advice.strategy == "broadcast_left":
        if "left" not in _broadcastable_sides(how):
            return left.join(right, on, how)  # hint would be ignored
        return F.broadcast(left).join(right, on, how)
    if advice.strategy == "broadcast_right":
        if "right" not in _broadcastable_sides(how):
            return left.join(right, on, how)
        return left.join(F.broadcast(right), on, how)
    if advice.strategy == "salted":
        big_is_left = advice.left_bytes >= advice.right_bytes
        if big_is_left and how in ("inner", "left"):
            return salted_join(
                left, right, on, advice.salt_factor or 8, how
            )
        if not big_is_left and how == "inner":
            # salted_join spreads the BIG side; inner is symmetric so
            # the swap is safe (column order is restored by select)
            return salted_join(
                right, left, on, advice.salt_factor or 8, how
            ).select(*left.columns, *[c for c in right.columns if c != on])
        return left.join(right, on, how)  # degrade, don't raise
    return left.join(right, on, how)


def advised_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    **advise_kwargs,
) -> tuple[DataFrame, JoinAdvice]:
    """One-call form: advise, execute, and return both."""
    advice = advise_join(left, right, on, how=how, **advise_kwargs)
    return apply_join(left, right, on, advice, how), advice
