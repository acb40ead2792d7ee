"""operators/seasonal.py — seasonal median/MAD anomaly detection."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.seasonal import (
    daily_totals,
    seasonal_scores,
    top_anomalies,
)


@pytest.fixture(scope="module")
def events(spark):
    """Four weeks of two event types; type 'a' has a planted 10× spike
    on the third Monday; type 'b' is constant (MAD 0 stratum)."""
    rows = []
    base = datetime.datetime(2024, 1, 1, 12, 0)  # a Monday
    eid = 0
    for day in range(28):
        ts = base + datetime.timedelta(days=day)
        spike = 10.0 if day == 14 else 1.0  # third Monday
        # deterministic week-to-week jitter so every stratum has a
        # nonzero MAD (a pure-constant baseline is the separate
        # MAD=0 case, covered by type 'b')
        jitter = 0.1 * ((day // 7) % 4)
        for _ in range(3):
            rows.append((eid, ts, "a", (2.0 + jitter) * spike)); eid += 1
            rows.append((eid, ts, "b", 5.0)); eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_daily_totals_exact_and_dow(events):
    d = {
        (r["event_type"], str(r["d"])): (r["total"], r["dow"])
        for r in daily_totals(events, ["event_type"]).collect()
    }
    assert d[("a", "2024-01-01")][0] == pytest.approx(6.0)
    assert d[("a", "2024-01-15")][0] == pytest.approx(66.0)  # 3 × 2.2 × 10
    assert d[("b", "2024-01-08")][0] == pytest.approx(15.0)
    # 2024-01-01 is a Monday; epoch (Thursday) ⇒ Monday ≡ 4 mod 7
    assert d[("a", "2024-01-01")][1] == 4
    assert d[("a", "2024-01-04")][1] == 0  # Thursday


def test_spike_is_top_anomaly(events):
    top = top_anomalies(events, ["event_type"], k=3).collect()
    assert top[0]["event_type"] == "a"
    assert str(top[0]["d"]) == "2024-01-15"
    assert top[0]["dev"] is not None and top[0]["dev"] > 3


def test_constant_stratum_has_null_dev(events):
    scores = seasonal_scores(events, ["event_type"])
    b = scores.where(F.col("event_type") == "b").collect()
    assert b and all(r["dev"] is None for r in b)
    assert all(r["mad"] == 0.0 for r in b)
    # and it never reaches the review queue
    top = top_anomalies(events, ["event_type"], k=100).collect()
    assert all(r["event_type"] != "b" for r in top)


def test_non_spike_mondays_score_low(events):
    scores = {
        str(r["d"]): r
        for r in seasonal_scores(events, ["event_type"])
        .where(F.col("event_type") == "a")
        .collect()
    }
    # the other three Mondays share total 6.0; their dev magnitude is
    # bounded by the spike's pull on the median/MAD
    spike = scores["2024-01-15"]
    for day in ("2024-01-01", "2024-01-08", "2024-01-22"):
        r = scores[day]
        assert r["dev"] is None or abs(r["dev"]) < abs(spike["dev"])


def test_partition_invariance(events):
    a = sorted(
        (r["event_type"], str(r["d"]), r["total"], r["med"], r["mad"], r["dev"])
        for r in seasonal_scores(events, ["event_type"]).collect()
    )
    b = sorted(
        (r["event_type"], str(r["d"]), r["total"], r["med"], r["mad"], r["dev"])
        for r in seasonal_scores(events.repartition(7), ["event_type"]).collect()
    )
    assert a == b


def test_registry_row_green(spark, sf_dir):
    from kinesis_vcr_spark.queries.stats import events_seasonal_anomaly

    rows = events_seasonal_anomaly(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    mags = [abs(r["dev"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    assert all(r["dev"] is not None for r in rows)
