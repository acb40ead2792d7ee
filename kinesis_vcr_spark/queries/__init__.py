"""Query registry — the driver-checkable surface of the engine.

Each :class:`QuerySpec` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with the equivalent ANSI SQL for DuckDB (the correctness
oracle). Column names/aliases MUST match between the two — the driver
sorts columns by name and value-hashes.

Hash-parity rules used throughout (enforced by the strict local harness
``tools/oracle_check.py``, which compares raw value strings exactly like
the driver):

- OUTPUT columns are never DECIMAL, DATE, or DuckDB-uncast integer sums:
  a Spark Decimal hashes as '167509.0000' vs DuckDB's float64
  '167509.0'; DuckDB ``sum(int)`` returns HUGEINT (→ float64) vs
  Spark's int64; Spark DateType prints '2024-01-01' vs DuckDB DATE as a
  midnight timestamp;
- money math accumulates in DECIMAL(18,4) casts on BOTH sides (exact,
  order-independent), then ``F.round(sum, 4).cast("double")`` ≡
  ``CAST(round(sum, 4) AS DOUBLE)`` — the same exact decimal converts
  to the same nearest-double on both engines;
- integer sums in DuckDB oracles wear ``CAST(... AS BIGINT)``;
- dates go out as 'yyyy-MM-dd' strings on both sides;
- ratios/averages = exact decimal sums cast to double, then divided
  (bit-deterministic given identical inputs);
- event-time filtering on ``ts_ns`` (exact int64) in Spark vs native
  TIMESTAMP_NS comparison in DuckDB, with whole-second bounds;
- no raw float aggregates, no raw nanosecond timestamps in output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → not SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


# ORDER IS LOAD-BEARING: the driver checks the FIRST 50 queries in
# registration order (VERDICT r02 — the 12 registered last got no
# correctness row at all). The reference-core vcr family goes first,
# then one representative block per family; the relational3 TPC-H
# variants (same family as relational/relational2, 13 near-duplicate
# shapes) deliberately take the positions past the window.
_MODULE_ORDER = (
    "vcr",
    "windowed",
    "tfidf",
    "textstats",
    "dedup",
    "similarity",
    "sketches",
    "skewq",
    "stats",
    "multimodal",
    "llmprep",
    "corpusprep",
    "relational",
    "relational2",
    "relational3",
    # overflow by design: the 50-slot window is fully allocated above;
    # these stay green via the strict local harness instead
    "filterq",
    "quantileq",
)


def _load_all() -> None:
    # Import for side effect: each module registers its specs.
    import importlib  # noqa: PLC0415

    for mod in _MODULE_ORDER:
        importlib.import_module(f"kinesis_vcr_spark.queries.{mod}")


def _module_rank(spec: QuerySpec) -> int:
    mod = spec.spark_fn.__module__.rsplit(".", 1)[-1]
    return _MODULE_ORDER.index(mod)


# Driver-window ROTATION SCHEDULE (VERDICT r04 item 1).
#
# Only the first DRIVER_WINDOW queries get a driver-side oracle row per
# round; everything later is held green by the strict local harness
# (tools/oracle_check.py). The per-name promote/demote lists of rounds
# 3-4 drained the never-checked backlog slower than new queries joined
# it (22 queries had never earned a driver row by r04), so rotation is
# now a deterministic COHORT CYCLE:
#
#   1. Order all oracle-paired queries canonically (module rank, then
#      in-module registration order); rows-only queries sort dead last
#      and never occupy a window slot.
#   2. Split that list into ceil(N / DRIVER_WINDOW) cohorts of
#      DRIVER_WINDOW consecutive queries.
#   3. At driver round r, rotate the cohort order by ``r mod ncohorts``
#      — so with 100 oracle-paired queries and a 50-slot window, odd
#      rounds check cohort 1 (the newer analytics half, including every
#      query that had no driver row at r04) and even rounds check
#      cohort 0 (reference-core + first-wave families). EVERY
#      oracle-paired query earns a driver row within ncohorts (=2)
#      consecutive rounds, and adding a third cohort later still
#      reaches everything within 3 rounds.
#
# The driver round is read from the committed CORRECTNESS_r{N}.json
# artifacts (max N + 1 = the round currently being checked); the
# SPARK_GRAFT_ROUND env var overrides for testing. At round 5 this puts
# the 20 never-checked queries (corpus_cdc_apply, events_expectations,
# source_lang_chi2, user_cohort_retention, decontam_bloom,
# lm_bigram_score, sample_weighted_docs, value_histogram, ...) in the
# window, per the r04 verdict.
DRIVER_WINDOW = 50


def _driver_round() -> int:
    import os  # noqa: PLC0415
    import re  # noqa: PLC0415
    from pathlib import Path  # noqa: PLC0415

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    root = Path(__file__).resolve().parents[2]
    rounds = [
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def all_queries(round_num: int | None = None) -> dict[str, QuerySpec]:
    """The registry in DRIVER order for the given round (default: the
    round currently being checked, inferred from committed
    CORRECTNESS artifacts).

    ``REGISTRY``'s raw insertion order is fragile: any direct import of
    a query module (a test, a notebook) before ``_load_all()`` would
    re-shuffle it. The canonical base order is therefore computed — by
    ``_MODULE_ORDER`` rank, insertion order within a module, rows-only
    queries dead last (a driver-window slot spent on a rows-only check
    displaces a full value-hash check; those ops are recall/property-
    tested in tests/ instead) — and then the oracle-paired prefix is
    cohort-rotated per the schedule documented above."""
    _load_all()
    items = list(REGISTRY.items())  # dict = insertion-ordered
    ordered = sorted(
        items,
        key=lambda kv: (kv[1].oracle is None, _module_rank(kv[1])),
    )  # sort is stable → insertion order preserved within a module
    paired = [kv for kv in ordered if kv[1].oracle is not None]
    rows_only = [kv for kv in ordered if kv[1].oracle is None]
    cohorts = [
        paired[i : i + DRIVER_WINDOW]
        for i in range(0, len(paired), DRIVER_WINDOW)
    ]
    r = _driver_round() if round_num is None else round_num
    phase = r % len(cohorts) if cohorts else 0
    rotated = [kv for c in cohorts[phase:] + cohorts[:phase] for kv in c]
    return dict(rotated + rows_only)
