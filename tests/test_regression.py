"""Grouped OLS via sufficient statistics (operators/regression.py)."""

from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.regression import grouped_ols


def _rows(df):
    return {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in df.collect()
    }


def test_perfect_line_recovered(spark):
    # y = 3 + 2x exactly -> slope 2, intercept 3, r2 1
    data = [("a", x, 3.0 + 2.0 * x) for x in range(10)]
    df = spark.createDataFrame(data, "g string, x long, y double")
    got = _rows(grouped_ols(df, ["g"], "x", "y"))
    assert got == {"a": (10, 2.0, 3.0, 1.0)}


def test_hand_computed_noisy_fit(spark):
    # points (0,0),(1,1),(2,1): slope=0.5, intercept=1/6, r2=0.75
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 1.0)],
        "g string, x long, y double",
    )
    got = _rows(grouped_ols(df, ["g"], "x", "y"))
    n, slope, intercept, r2 = got["a"]
    assert (n, slope, r2) == (3, 0.5, 0.75)
    assert abs(intercept - 1 / 6) < 1e-6


def test_constant_x_gives_null_slope(spark):
    df = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 2.0)], "g string, x long, y double"
    )
    got = _rows(grouped_ols(df, ["g"], "x", "y"))
    assert got["a"][1] is None and got["a"][2] is None


def test_constant_y_gives_zero_slope_null_r2(spark):
    df = spark.createDataFrame(
        [("a", 1, 7.0), ("a", 2, 7.0), ("a", 3, 7.0)],
        "g string, x long, y double",
    )
    got = _rows(grouped_ols(df, ["g"], "x", "y"))
    n, slope, intercept, r2 = got["a"]
    assert (slope, intercept) == (0.0, 7.0)
    assert r2 is None  # var(y) = 0: R² undefined, not NaN/crash


def test_groups_fit_independently(spark):
    data = [("up", x, float(x)) for x in range(5)] + [
        ("down", x, float(-x)) for x in range(5)
    ]
    df = spark.createDataFrame(data, "g string, x long, y double")
    got = _rows(grouped_ols(df, ["g"], "x", "y"))
    assert got["up"][1] == 1.0 and got["down"][1] == -1.0


def test_partitioning_invariance(spark):
    # exact decimal/int sufficient sums -> identical doubles regardless
    # of physical layout (the float64-sum failure mode this guards)
    data = [("a", x, 0.1 * x + 0.33) for x in range(200)]
    df = spark.createDataFrame(data, "g string, x long, y double")
    one = _rows(grouped_ols(df.coalesce(1), ["g"], "x", "y"))
    many = _rows(grouped_ols(df.repartition(16), ["g"], "x", "y"))
    assert one == many


def test_plan_single_agg_no_python(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "g string, x long, y double"
    )
    plan = (
        grouped_ols(df, ["g"], "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    # one keyed exchange: partial + final hash aggregate, nothing else
    assert plan.count("Exchange hashpartitioning") <= 1
