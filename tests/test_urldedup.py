"""URL canonicalization + canonical-URL dedup (operators/urldedup.py,
E91): expression-level canonicalizer cases (the same fixtures the
DuckDB oracle chain was verified against), dedup aggregation
semantics, and the injected driver query's group structure."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.urldedup import (
    canonicalize_url,
    url_dedup_groups,
    url_occurrences,
)

# (raw, canonical) — every step of the chain exercised at least once;
# the SAME fixtures were run through the DuckDB oracle chain, so this
# table pins Spark/DuckDB regexp agreement at the expression level.
CASES = [
    ("https://example1.com/Page1", "example1.com/Page1"),
    ("http://www.example1.com/Page1/", "example1.com/Page1"),
    (
        "https://EXAMPLE1.com:443/Page1?q=2&utm_source=feed#sec",
        "example1.com/Page1?q=2",
    ),
    ("http://example1.com:80/Page1?fbclid=abc", "example1.com/Page1"),
    # tracking params at every position; kept param survives
    ("https://site.com/p?utm_a=1&utm_b=2&keep=3", "site.com/p?keep=3"),
    # non-default port and path case are PRESERVED; host case is not
    (
        "HTTPS://WWW.Site.com:8080/CaseSensitive/Path?x=1&gclid=z&y=2#f",
        "site.com:8080/CaseSensitive/Path?x=1&y=2",
    ),
    # bare host; trailing slash; scheme-only difference
    ("http://Host.Org/", "host.org"),
    ("https://host.org", "host.org"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [Row(raw=r, want=w) for r, w in CASES]
    ).withColumn("got", canonicalize_url(F.col("raw")))
    bad = df.where(F.col("got") != F.col("want")).collect()
    assert not bad, [(r["raw"], r["got"], r["want"]) for r in bad]


def test_url_occurrences_extracts_and_keys(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="see https://a.com/x and http://www.a.com/x/"),
            Row(doc_id=2, text="no links here"),
            Row(doc_id=3, text="dup https://a.com/x again"),
        ]
    )
    occ = url_occurrences(docs).collect()
    assert len(occ) == 3  # doc 2 contributes nothing
    assert all(r["canon_url"] == "a.com/x" for r in occ)


def test_url_dedup_groups_counts_and_keep(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="x https://a.com/x"),
            Row(doc_id=11, text="x http://www.a.com/x/"),
            Row(doc_id=12, text="x https://a.com/x"),  # repeat raw form
            Row(doc_id=13, text="y https://b.com/y?only=1"),
        ]
    )
    rows = {
        r["canon_url"]: r
        for r in url_dedup_groups(docs).collect()
    }
    a = rows["a.com/x"]
    assert (a["n_occurrences"], a["n_raw_variants"], a["n_docs"]) == (3, 2, 3)
    assert a["keep_doc_id"] == 10
    b = rows["b.com/y?only=1"]
    assert (b["n_occurrences"], b["n_raw_variants"], b["n_docs"]) == (1, 1, 1)


def test_driver_query_group_structure(spark, sf_dir):
    """The injected query must produce exactly 6 canonical keys
    (3 page groups × {collapsed, kept-?q=2}) with every document
    accounted for exactly once."""
    from kinesis_vcr_spark.queries.filterq import url_canonical_dedup

    out = url_canonical_dedup(spark, sf_dir).collect()
    n_docs_total = sum(r["n_occurrences"] for r in out)
    from kinesis_vcr_spark.tables import load_table

    assert n_docs_total == load_table(spark, sf_dir, "documents").count()
    keys = [r["canon_url"] for r in out]
    assert len(keys) == 6
    for g in range(3):
        assert f"example{g}.com/Page{g}" in keys
        assert f"example{g}.com/Page{g}?q=2" in keys
    # variants 0/1/3 of each group collapse: ≥2 raw spellings per key
    collapsed = [r for r in out if "?" not in r["canon_url"]]
    assert all(r["n_raw_variants"] >= 2 for r in collapsed)


def test_plan_is_single_exchange(spark):
    """100 TB posture pin: extract+canonicalize are narrow (no
    exchange before the aggregation); the dedup is one hash
    aggregation family over the canonical key, JVM-only (no Python
    workers in the plan)."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x https://a.com/x")]
    )
    plan = url_dedup_groups(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    # countDistinct plans its standard two-level expand/aggregate; what
    # must NOT appear is a join, a cartesian product, or Python eval
    for bad in ("Join", "Cartesian", "Python", "BatchEvalPython"):
        assert bad not in plan, plan
