"""KMV bottom-k sketch (operators/sketch.py kmv_*)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.sketch import (
    kmv_distinct,
    kmv_jaccard,
    kmv_sketch,
)


def _vals(spark, side, values):
    return spark.createDataFrame(
        [Row(side=side, v=str(x)) for x in values]
    )


def test_small_set_is_exact(spark):
    df = _vals(spark, 0, [f"x{i}" for i in range(50)] * 3)  # dups collapse
    sk = kmv_sketch(df, ["side"], "v", k=1024)
    est = sk.select(kmv_distinct(F.col("hs"), 1024).alias("d")).collect()[0].d
    assert est == 50.0  # sketch IS the set below k


def test_estimate_within_error_bound(spark):
    n = 20_000
    df = _vals(spark, 0, [f"item-{i}" for i in range(n)])
    sk = kmv_sketch(df, ["side"], "v", k=1024)
    est = sk.select(kmv_distinct(F.col("hs"), 1024).alias("d")).collect()[0].d
    assert abs(est - n) / n < 0.10  # 1/sqrt(k-2) ≈ 3%; 10% = 3σ head-room


def test_jaccard_identical_disjoint_half(spark):
    a = [f"common-{i}" for i in range(3000)]
    b_half = a[:1500] + [f"only-b-{i}" for i in range(1500)]
    sk = kmv_sketch(
        _vals(spark, 0, a)
        .unionByName(_vals(spark, 1, a))
        .unionByName(_vals(spark, 2, [f"other-{i}" for i in range(3000)]))
        .unionByName(_vals(spark, 3, b_half)),
        ["side"], "v", k=1024,
    )
    hs = {r.side: r.hs for r in sk.collect()}
    one_row = sk.sparkSession.createDataFrame(
        [Row(a_hs=hs[0], b_hs=hs[1], c_hs=hs[2], d_hs=hs[3])]
    )
    got = one_row.select(
        kmv_jaccard(F.col("a_hs"), F.col("b_hs"), 1024).alias("same"),
        kmv_jaccard(F.col("a_hs"), F.col("c_hs"), 1024).alias("disjoint"),
        kmv_jaccard(F.col("a_hs"), F.col("d_hs"), 1024).alias("half"),
    ).collect()[0]
    assert got.same == 1.0
    assert got.disjoint == 0.0
    # true J = 1500/4500 = 1/3; KMV error ~ 1/sqrt(k) ≈ 0.03
    assert abs(got.half - 1 / 3) < 0.1


def test_sketch_merge_equals_sketch_of_union(spark):
    """Bottom-k of (bottom-k(A) ∪ bottom-k(B)) == bottom-k(A ∪ B) —
    the mergeability that lets per-partition/per-day sketches combine
    losslessly."""
    a = [f"a-{i}" for i in range(5000)]
    b = [f"b-{i}" for i in range(5000)]
    sk = {r.side: r.hs for r in kmv_sketch(
        _vals(spark, 0, a).unionByName(_vals(spark, 1, b))
        .unionByName(_vals(spark, 2, a + b)),
        ["side"], "v", k=512,
    ).collect()}
    merged = sorted(set(sk[0]) | set(sk[1]))[:512]
    assert merged == list(sk[2])


def test_formula_boundary_at_k_parity(spark):
    """VERDICT r04 item 8: kmv_distinct switches formulas at
    ``len(hs) < k``. Land fixtures at exactly k-1, k, and k+1 distinct
    values and pin the estimate AND cross-engine (DuckDB) parity at
    each side of the boundary — the production fixtures sit far from
    it."""
    import duckdb

    k = 16
    space = float(16**15)
    for n in (k - 1, k, k + 1):
        vals = [f"boundary-{n}-{i}" for i in range(n)]
        df = _vals(spark, "s", vals)
        sk = kmv_sketch(df, ["side"], "v", k=k)
        row = sk.select(
            F.size("hs").alias("sz"),
            kmv_distinct(F.col("hs"), k).alias("d"),
        ).collect()[0]
        # sketch is capped at k entries; below k it IS the set
        assert row.sz == min(n, k), n
        if n < k:
            assert row.d == float(n), f"exact path broke at n={n}"
        else:
            # estimator path engaged exactly at len(hs) == k
            assert row.d != float(n) or n == k  # formula output, not count
        # DuckDB rebuilds the identical sketch + estimate (same CASE
        # expression as the corpus_overlap_kmv oracle)
        con = duckdb.connect()
        oracle = con.execute(
            f"""
            WITH h AS (
              SELECT DISTINCT substr(md5(v), 1, 15) AS h
              FROM (SELECT unnest(?) AS v)
            ), bk AS (
              SELECT list_slice(list_sort(list(h)), 1, {k}) AS hs FROM h
            )
            SELECT CASE WHEN len(hs) < {k}
                     THEN CAST(len(hs) AS DOUBLE)
                     ELSE round({k - 1}.0
                          / (CAST('0x' || hs[len(hs)] AS UBIGINT)
                             / {space!r}), 4) END AS d
            FROM bk
            """,
            [vals],
        ).fetchone()[0]
        assert repr(row.d) == repr(oracle), (
            f"boundary parity broke at n={n}: spark={row.d!r} duckdb={oracle!r}"
        )
