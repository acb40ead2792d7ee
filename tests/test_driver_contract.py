"""The driver contract must never regress again: entry() runs, every
queries() key has a callable, and oracle coverage is explicit."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def test_registry_loads():
    from kinesis_vcr_spark.queries import all_queries

    qs = all_queries()
    assert len(qs) >= 11
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_driver_window_rotation_schedule():
    """The driver correctness-checks exactly the FIRST 50 queries per
    round (VERDICT r02: the 12 registered last got no row). Rotation is
    least-recently-checked-first from committed CORRECTNESS artifacts
    (the r04 cohort cycle silently rotated the promised window away
    when registering one more query changed the cohort count): EVERY
    registry entry — rows-only included since r10 (VERDICT r09 item 6:
    sorting them dead last left two entries with zero driver history
    forever) — must earn a driver row within ceil(N_total/50) ≤ 3
    consecutive rounds, never-checked queries always come first with
    oracle-paired entries winning staleness ties, and the current
    window must contain the 8 promotions the r04 verdict named."""
    import json
    import math
    from pathlib import Path

    from kinesis_vcr_spark.queries import (
        DRIVER_WINDOW,
        _current_round,
        all_queries,
    )

    oracles = entrymod.oracle_sql()
    paired = set(oracles)
    cur = _current_round()

    # (a) union of windows over ceil(N_total/50) consecutive rounds
    # (the current one + simulated successors) covers the ENTIRE
    # registry, rows-only entries included — the whole point of the
    # rotation
    every = set(all_queries())
    ncoh = math.ceil(len(every) / DRIVER_WINDOW)
    assert ncoh <= 3, "rotation must reach every query within 3 rounds"
    union = set()
    for r in range(cur, cur + ncoh):
        union |= set(list(all_queries(r))[:DRIVER_WINDOW])
    missing = every - union
    assert not missing, f"never reach driver window: {missing}"

    # (b) oracle-paired entries win staleness TIES against rows-only
    # peers: simulate a fully-drained state where everything was
    # checked in the same round — the window must then be all-paired
    # (rows-only only enter ahead of a paired entry when genuinely
    # staler, never at equal staleness)
    from unittest import mock

    from kinesis_vcr_spark import queries as qmod

    drained = dict.fromkeys(every, (cur - 1, True))
    with mock.patch.object(qmod, "_last_checked", lambda: dict(drained)):
        window = list(qmod.all_queries())[:DRIVER_WINDOW]
    unpaired = [n for n in window if n not in paired]
    assert not unpaired, f"rows-only beat equally-stale paired: {unpaired}"

    # (c) never-driver-checked queries sort FIRST: anything absent from
    # every committed CORRECTNESS file must be in the current window
    # (this is what drains the backlog; includes the 8 promotions the
    # r04 verdict named, all unchecked as of r04)
    checked: set[str] = set()
    root = Path(__file__).resolve().parents[1]
    for p in root.glob("CORRECTNESS_r*.json"):
        checked |= set(json.loads(p.read_text()))
    never = paired - checked
    w_now = set(list(all_queries())[:DRIVER_WINDOW])
    assert len(never) <= DRIVER_WINDOW, "backlog outgrew the window"
    assert never <= w_now, f"never-checked outside current window: {never - w_now}"
    named = {
        "corpus_cdc_apply", "events_expectations", "source_lang_chi2",
        "user_cohort_retention", "decontam_bloom", "lm_bigram_score",
        "sample_weighted_docs", "value_histogram",
    }
    assert named <= (w_now | checked), f"r04 promotions dropped: {named - w_now - checked}"

    # (d) the __spark_entry__ surface the driver actually calls agrees
    # with the schedule
    assert list(entrymod.queries()) == list(all_queries()), (
        "entry queries() diverged from schedule"
    )


def test_driver_window_fail_aware():
    """A query whose LATEST committed driver row FAILED must jump the
    LRU queue (VERDICT r05 item 1: q22_dormant_rich's r02 hash FAIL sat
    behind its round peers). Checked both against the real committed
    artifacts and synthetically."""
    from unittest import mock

    from kinesis_vcr_spark import queries as qmod
    from kinesis_vcr_spark.queries import DRIVER_WINDOW, _last_checked, _row_ok

    # _row_ok semantics: rows-only designation is not a failure
    assert _row_ok({"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None})
    assert not _row_ok({"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None})
    assert _row_ok({"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "no_oracle"})
    assert not _row_ok({"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "boom"})

    # real artifacts: every paired query whose latest row failed leads
    # the current window (set may be empty in a fully-green repo)
    last = _last_checked()
    paired = set(entrymod.oracle_sql())
    failed_last = {n for n in paired if not last.get(n, (-1, True))[1]}
    window = list(qmod.all_queries())
    head = set(window[: len(failed_last)]) if failed_last else set()
    assert failed_last <= head, (
        f"failed-last-check queries not at window front: {failed_last - head}"
    )

    # synthetic: mark a mid-pack, recently-PASSED query as failed-last
    # and it must move to position 0
    recent = [n for n in window[DRIVER_WINDOW:] if n in paired]
    assert recent, "need a paired query outside the current window"
    victim = recent[-1]
    state = dict(last)
    for n in failed_last:  # neutralize real fails so victim is alone
        state[n] = (state[n][0], True)
    state[victim] = (state.get(victim, (3, True))[0], False)
    with mock.patch.object(qmod, "_last_checked", return_value=state):
        assert list(qmod.all_queries())[0] == victim
