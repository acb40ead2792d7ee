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
    a deterministic cohort cycle (VERDICT r04 item 1): every
    oracle-paired query must earn a driver row within ncohorts (≤3)
    consecutive rounds, rows-only queries never occupy a window slot,
    and the round-5 window must contain the 8 promotions the r04
    verdict named."""
    from kinesis_vcr_spark.queries import DRIVER_WINDOW, all_queries

    oracles = entrymod.oracle_sql()
    paired = set(oracles)

    # (a) union of windows over ncohorts consecutive rounds covers ALL
    # oracle-paired queries — the whole point of the rotation
    import math
    ncoh = math.ceil(len(paired) / DRIVER_WINDOW)
    assert ncoh <= 3, "cohort cycle must reach every query within 3 rounds"
    for start in (5, 6):  # schedule holds from any phase
        union = set()
        for r in range(start, start + ncoh):
            union |= set(list(all_queries(r))[:DRIVER_WINDOW])
        missing = paired - union
        assert not missing, f"never reach driver window (from r{start}): {missing}"

    # (b) no round wastes a window slot on a rows-only query
    for r in (5, 6, 7):
        window = list(all_queries(r))[:DRIVER_WINDOW]
        unpaired = [n for n in window if n not in paired]
        assert not unpaired, f"rows-only queries inside r{r} window: {unpaired}"

    # (c) the r04 verdict's named promotions are in the round-5 window
    w5 = set(list(all_queries(5))[:DRIVER_WINDOW])
    named = {
        "corpus_cdc_apply", "events_expectations", "source_lang_chi2",
        "user_cohort_retention", "decontam_bloom", "lm_bigram_score",
        "sample_weighted_docs", "value_histogram",
    }
    assert named <= w5, f"r04-named promotions outside round-5 window: {named - w5}"

    # (d) the default (round inferred from CORRECTNESS artifacts) is a
    # valid phase of the same cycle — the __spark_entry__ surface the
    # driver actually calls agrees with all_queries() for some round
    names = list(entrymod.queries())
    assert any(
        names == list(all_queries(r)) for r in range(ncoh)
    ) or names == list(all_queries()), "entry queries() diverged from schedule"
