"""Table profiler (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import Row

from kinesis_vcr_spark.operators.profile import profile_table


def _df(spark):
    rows = [
        Row(id=1, name="alpha", score=0.5),
        Row(id=2, name="beta", score=None),
        Row(id=3, name=None, score=2.25),
        Row(id=3, name="alpha", score=0.5),
    ]
    return spark.createDataFrame(rows)


def test_profile_values(spark):
    p = {r.col_name: r for r in profile_table(_df(spark)).collect()}
    assert set(p) == {"id", "name", "score"}
    for r in p.values():
        assert r.n_rows == 4
    assert p["id"].n_null == 0 and p["id"].n_distinct == 3
    assert p["id"].min_num == 1.0 and p["id"].max_num == 3.0
    assert p["id"].min_str is None
    assert p["name"].n_null == 1 and p["name"].n_distinct == 2
    assert p["name"].min_str == "alpha" and p["name"].max_str == "beta"
    assert p["name"].min_num is None
    assert p["score"].n_null == 1 and p["score"].n_distinct == 2
    assert p["score"].min_num == 0.5 and p["score"].max_num == 2.25


def test_single_pass_plan(spark):
    """All columns profile in ONE aggregation over one scan — no
    per-column jobs (the multi-distinct plans via Expand)."""
    import io
    from contextlib import redirect_stdout

    df = profile_table(_df(spark))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    import re

    # tree lines carry "(id)" after the node name; details repeat them
    scan_ids = set(re.findall(r"Scan \w+ ?\((\d+)\)", plan))
    assert len(scan_ids) == 1, scan_ids


def test_approx_mode_runs(spark):
    p = {r.col_name: r for r in profile_table(
        _df(spark), exact_distinct=False).collect()}
    # HLL on tiny sets is exact
    assert p["id"].n_distinct == 3
