"""Blocked fuzzy join — edit-distance record linkage as an equi-join.

The classic pipeline op for linking noisy records (Ed-Join / PPJoin
family): Spark has no similarity-join strategy, so ``a JOIN b ON
levenshtein(a.s, b.s) <= d`` plans as a nested loop — O(N·M) distance
computations, a non-starter at scale. The standard fix is blocking:
derive a small set of deterministic block keys per record such that any
pair within the distance budget shares at least one key, equi-join on
the key, then verify the exact distance only on co-blocked candidates.

Blocking contract here: **affix blocks** — the first ``affix_len``
characters and the last ``affix_len`` characters (plus a length band:
``|len(a) − len(b)| ≤ max_dist``, a hard Levenshtein lower bound). A
pair is a candidate iff it shares its prefix block or its suffix block.
Single-edit pairs always share at least one (an edit cannot touch both
affixes); pairs with edits clustered in BOTH affixes are missed — that
bounded miss is the operator's documented contract (same discipline as
LSH banding), and the oracle SQL encodes the identical rule, so
correctness checks are exact, not probabilistic.

Scale posture:

- candidates come from ONE posexplode + equi-self-join on
  ``(block_pos, block_key)`` — hash-partitioned, never all-pairs; the
  repartition doubles as the exchange both join sides reuse;
- ``block_member_cap`` drops degenerate blocks (a boilerplate prefix
  shared by millions of records would go quadratic inside the block —
  the shared :func:`~kinesis_vcr_spark.operators.dedup.cap_group_size`
  guard);
- verification is JVM ``levenshtein`` (dynamic-programming codegen) on
  co-blocked pairs only, after the free length-band pre-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.dedup import (
    DEFAULT_BAND_MEMBER_CAP,
    _candidate_pairs_from_bands,
)


def _affix_blocks(text_col: str, affix_len: int) -> F.Column:
    """[prefix_{affix_len}, suffix_{affix_len}] as RAW strings — the
    block position in the exploded (pos, key) pair keeps prefix and
    suffix namespaces apart, and raw keys (vs hashes) make the
    candidate set bit-identical to the oracle SQL's (a hash collision
    could otherwise admit a Spark-only candidate)."""
    prefix = F.expr(f"substring(`{text_col}`, 1, {affix_len})")
    suffix = F.expr(
        f"substring(`{text_col}`, "
        f"greatest(length(`{text_col}`) - {affix_len - 1}, 1), {affix_len})"
    )
    return F.array(prefix, suffix)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    affix_len: int = 8,
    block_member_cap: int | None = DEFAULT_BAND_MEMBER_CAP,
) -> DataFrame:
    """``(id_a, id_b, dist)`` for co-blocked pairs with
    ``levenshtein ≤ max_dist`` (``id_a < id_b``, ``dist`` bigint).

    See the module docstring for the affix-blocking contract. Pick
    ``affix_len`` long enough that random records rarely share an affix
    (candidates stay near-linear) and short enough that the records you
    care about aren't distinguished only inside the affixes.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if affix_len < 1:
        raise ValueError(f"affix_len must be >= 1, got {affix_len}")
    # per-pair verify work (O(len²) DP) dwarfs the tiny block table, so
    # both the self-join and the verify stage pin their parallelism —
    # AQE's byte-based sizing otherwise runs the whole Levenshtein
    # stage on 1 task (measured at sf0.1)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    blocked = df.select(
        F.col(id_col), _affix_blocks(text_col, affix_len).alias("bands")
    )
    pairs = _candidate_pairs_from_bands(
        blocked, id_col, block_member_cap, num_partitions=n_parts
    ).repartition(n_parts, "id_a")
    txt = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    ta = txt.select(F.col(id_col).alias("id_a"), F.col("__t").alias("t_a"))
    tb = txt.select(F.col(id_col).alias("id_b"), F.col("__t").alias("t_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        # length band first: free lower bound, prunes before the O(n²)
        # distance DP runs
        .where(
            F.abs(F.length("t_a") - F.length("t_b")) <= F.lit(max_dist)
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("t_a", "t_b").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= F.lit(max_dist))
    )
