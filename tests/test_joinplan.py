"""Adaptive join advisor: decisions flip on the right evidence and
every strategy returns the identical join result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.joinplan import (
    JoinAdvice,
    advise_join,
    advised_join,
    apply_join,
    measure_key_skew,
    plan_size_bytes,
)


@pytest.fixture()
def skewed(spark, tmp_path):
    """A large-ish skewed fact (key 0 holds half the rows) and a small
    dim, both as parquet so plan stats are real file sizes."""
    fact_rows = [(0 if i % 2 == 0 else i % 500, i) for i in range(20_000)]
    fact = spark.createDataFrame(fact_rows, "k long, payload long")
    dim = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(500)], "k long, name string"
    )
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact.write.parquet(fp)
    dim.write.parquet(dp)
    return spark.read.parquet(fp), spark.read.parquet(dp)


def test_plan_size_reads_metadata(skewed):
    fact, dim = skewed
    assert plan_size_bytes(fact) > plan_size_bytes(dim) > 0


def test_skew_measurement(skewed):
    fact, _ = skewed
    skew, mx = measure_key_skew(fact, "k")
    assert mx == 10_000          # key 0 holds half of 20k rows
    assert skew > 100            # mean group ≈ 40, max 10k


def test_small_dim_gets_broadcast(skewed):
    fact, dim = skewed
    advice = advise_join(fact, dim, "k")
    assert advice.strategy == "broadcast_right"
    assert "broadcast_right" in advice.describe()


def test_skew_triggers_salting_when_broadcast_impossible(skewed):
    fact, dim = skewed
    # force the threshold below both sides: broadcast is off the table
    advice = advise_join(fact, dim, "k", broadcast_threshold_bytes=1)
    assert advice.strategy == "salted"
    assert advice.skew_factor > 8
    assert 2 <= advice.salt_factor <= 64


def test_no_skew_no_salt_sort_merge(spark, tmp_path):
    a = spark.createDataFrame(
        [(i % 1000, i) for i in range(10_000)], "k long, v long"
    )
    b = spark.createDataFrame(
        [(i % 1000, -i) for i in range(10_000)], "k long, w long"
    )
    ap, bp = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(ap)
    b.write.parquet(bp)
    a, b = spark.read.parquet(ap), spark.read.parquet(bp)
    advice = advise_join(a, b, "k", broadcast_threshold_bytes=1)
    assert advice.strategy == "sort_merge"
    # uniform 10 rows/key: skew factor ~1
    assert advice.skew_factor < 2


def test_metadata_only_mode_never_salts(skewed):
    fact, dim = skewed
    advice = advise_join(
        fact, dim, "k", broadcast_threshold_bytes=1, measure_skew=False
    )
    assert advice.strategy == "sort_merge"
    assert advice.skew_factor is None


def test_all_strategies_agree_on_result(skewed):
    fact, dim = skewed
    expected = sorted(
        map(tuple, fact.join(dim, "k").select("k", "payload", "name").collect())
    )
    for strategy in ("broadcast_right", "broadcast_left", "salted",
                     "sort_merge"):
        advice = JoinAdvice(
            strategy,
            left_bytes=plan_size_bytes(fact),
            right_bytes=plan_size_bytes(dim),
            salt_factor=8,
        )
        got = sorted(
            map(
                tuple,
                apply_join(fact, dim, "k", advice)
                .select("k", "payload", "name")
                .collect(),
            )
        )
        assert got == expected, strategy


def test_advised_join_one_call(skewed):
    fact, dim = skewed
    out, advice = advised_join(fact, dim, "k")
    assert advice.strategy == "broadcast_right"
    assert out.count() == fact.count()  # every fact key exists in dim


def test_salted_right_big_left_outer_degrades(skewed):
    """ADVICE r04: salted advice that `how` can't honor (big side on
    the right, left-outer) must execute as a plain sort-merge with the
    correct outer semantics instead of raising."""
    fact, dim = skewed
    advice = JoinAdvice(
        "salted", left_bytes=1, right_bytes=10**9, salt_factor=4
    )
    got = sorted(
        map(tuple, apply_join(dim, fact, "k", advice, how="left")
            .select("k", "name", "payload").collect())
    )
    expected = sorted(
        map(tuple, dim.join(fact, "k", "left")
            .select("k", "name", "payload").collect())
    )
    assert got == expected


def test_advise_respects_join_type(skewed):
    """ADVICE r04: a broadcast hint on the outer-PRESERVED side is
    silently ignored by Spark, so advise_join must never recommend it."""
    fact, dim = skewed
    # threshold between the two plan sizes: only dim is broadcastable
    th = (plan_size_bytes(dim) + plan_size_bytes(fact)) // 2
    # inner: small dim on the right broadcasts
    adv = advise_join(fact, dim, "k", how="inner", broadcast_threshold_bytes=th)
    assert adv.strategy == "broadcast_right"
    # left outer with the small side on the LEFT: broadcasting the
    # preserved left is illegal; right (fact) is over threshold →
    # sort-merge, and salting can't preserve left-outer with the big
    # side on the right, so no salted advice either
    adv = advise_join(dim, fact, "k", how="left", broadcast_threshold_bytes=th)
    assert adv.strategy == "sort_merge"
    # right outer mirrors: only the left side may be broadcast
    adv = advise_join(dim, fact, "k", how="right", broadcast_threshold_bytes=th)
    assert adv.strategy == "broadcast_left"
    adv = advise_join(fact, dim, "k", how="right", broadcast_threshold_bytes=th)
    assert adv.strategy != "broadcast_right"
    # full outer: neither side is broadcastable
    adv = advise_join(fact, dim, "k", how="full", broadcast_threshold_bytes=th)
    assert adv.strategy == "sort_merge"
    # left outer with the big side on the LEFT may still salt
    adv = advise_join(
        fact, dim, "k", how="left", broadcast_threshold_bytes=1
    )
    assert adv.strategy == "salted"


def test_advised_join_outer_end_to_end(skewed):
    """advised_join threads `how` into both advice and execution."""
    fact, dim = skewed
    th = (plan_size_bytes(dim) + plan_size_bytes(fact)) // 2
    out, advice = advised_join(
        dim, fact, "k", how="left", broadcast_threshold_bytes=th
    )
    assert advice.strategy == "sort_merge"
    assert out.count() == dim.join(fact, "k", "left").count()


def test_plan_size_private_api_contract(skewed):
    """VERDICT r04 item 7: plan_size_bytes rides the internal
    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    surface. Pin the exact call shape so a Spark upgrade that changes
    it fails HERE with a named contract, not deep in advise_join; and
    pin the public EXPLAIN COST fallback as value-equivalent."""
    from kinesis_vcr_spark.operators.joinplan import (
        _plan_size_bytes_explain_cost,
    )

    fact, _ = skewed
    # (a) each link of the private chain resolves by name
    qe = fact._jdf.queryExecution()
    plan = qe.optimizedPlan()
    stats = plan.stats()
    assert int(stats.sizeInBytes()) > 0, (
        "Spark changed the queryExecution/optimizedPlan/stats/sizeInBytes "
        "contract (valid 3.0-4.x): port plan_size_bytes to the EXPLAIN "
        "COST fallback"
    )
    # (b) the public fallback parses to the same number (KiB rounding
    # in the rendered text allows ~2.5% slack)
    private = plan_size_bytes(fact)
    public = _plan_size_bytes_explain_cost(fact)
    assert abs(private - public) <= max(64, private * 0.025)
