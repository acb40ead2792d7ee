"""CDC apply: insert/update/delete in one pass, latest-wins ordering,
deterministic tie handling."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.operators.cdc import apply_cdc


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, v string"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string, seq long")


def test_insert_update_delete_one_pass(spark, base):
    changes = _changes(
        spark,
        [
            (2, "two-v2", "U", 10),   # update
            (3, None, "D", 11),       # delete
            (4, "four", "U", 12),     # insert
        ],
    )
    got = sorted(
        map(tuple, apply_cdc(base, changes, ["k"], "seq").collect())
    )
    assert got == [(1, "one"), (2, "two-v2"), (4, "four")]


def test_latest_change_wins(spark, base):
    changes = _changes(
        spark,
        [
            (2, "v2", "U", 10),
            (2, "v3", "U", 30),
            (2, "v2b", "U", 20),
            (1, "gone", "D", 5),
            (1, "back", "U", 6),      # reinsert after delete
        ],
    )
    got = dict(apply_cdc(base, changes, ["k"], "seq").collect())
    assert got[2] == "v3"
    assert got[1] == "back"


def test_delete_wins_equal_order(spark, base):
    changes = _changes(
        spark, [(3, "racy", "U", 7), (3, None, "D", 7)]
    )
    got = {r.k for r in apply_cdc(base, changes, ["k"], "seq").collect()}
    assert got == {1, 2}  # conservative: the tied delete wins


def test_change_beats_base_at_any_order(spark, base):
    changes = _changes(spark, [(1, "new", "U", -999)])
    got = dict(apply_cdc(base, changes, ["k"], "seq").collect())
    assert got[1] == "new"


def test_idempotent_replay(spark, base):
    """Applying the same feed twice (at-least-once delivery) changes
    nothing — row_number dedup makes replays invisible."""
    changes = _changes(
        spark, [(2, "v2", "U", 10), (3, None, "D", 11), (4, "four", "U", 12)]
    )
    once = apply_cdc(base, changes, ["k"], "seq")
    twice = apply_cdc(once, changes, ["k"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_schema_contract_enforced(spark, base):
    with pytest.raises(ValueError, match="missing required column"):
        apply_cdc(base, base, ["k"], "seq")
    bad_base = base.withColumnRenamed("v", "op")
    changes = _changes(spark, [(1, "x", "U", 1)]).withColumnRenamed(
        "v", "op2"
    )
    with pytest.raises(ValueError, match="feed-side"):
        apply_cdc(
            bad_base,
            _changes(spark, [(1, "x", "U", 1)]).withColumnRenamed("v", "w"),
            ["k"],
            "seq",
        )


def test_null_order_change_still_beats_base(spark, base):
    """A change row with a NULL order value (feed bug / late tombstone)
    must deterministically beat the base row and lose to every ordered
    change — never demote to an arbitrary-winner tie with base."""
    changes = _changes(
        spark,
        [(1, "null-ord", "U", None), (2, "v2", "U", 5), (2, "null", "U", None)],
    )
    got = dict(apply_cdc(base, changes, ["k"], "seq").collect())
    assert got[1] == "null-ord"   # beats base deterministically
    assert got[2] == "v2"         # ordered change beats null-ord change
    # and a NULL-ord delete removes the key (conservative, deterministic)
    deletes = _changes(spark, [(3, None, "D", None)])
    got2 = {r.k for r in apply_cdc(base, deletes, ["k"], "seq").collect()}
    assert got2 == {1, 2}


def test_equal_order_upsert_tie_is_partitioning_independent(spark):
    """ADVICE r04: two upserts with the same key AND the same order
    value but different payloads must pick the same winner no matter
    how the feed is partitioned (payload-hash tiebreak)."""
    from kinesis_vcr_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame([(1, "orig"), (2, "keep")], "k long, v string")
    ties = [(1, f"cand-{i}", "U", 100) for i in range(8)] + [(2, "only", "U", 5)]
    winners = []
    for nparts in (1, 3, 8):
        changes = spark.createDataFrame(
            ties, "k long, v string, op string, seq long"
        ).repartition(nparts)
        snap = apply_cdc(base, changes, ["k"], "seq")
        winners.append(sorted(map(tuple, snap.collect())))
    assert winners[0] == winners[1] == winners[2]
    # and the tied key resolved to ONE of the candidates, not the base
    tied = dict(winners[0])
    assert tied[1].startswith("cand-")
    assert tied[2] == "only"
