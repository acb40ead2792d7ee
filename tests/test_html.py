"""HTML → text extraction (functions/html.py, E94): extraction
semantics on hand-built markup, signal arithmetic, Spark/DuckDB chain
agreement on the shared step table, and the zero-exchange plan pin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.functions.html import (
    html_signals,
    html_to_text,
    html_to_text_sql,
)

CASES = [
    # script/style/comment bodies vanish entirely
    (
        "<script>if (a < b) alert('x');</script><p>Keep</p>"
        "<style>p{}</style><!-- gone -->",
        "Keep",
    ),
    # block boundaries become newlines; inline tags become spaces
    (
        "<h1>Title</h1><p>One <b>bold</b> word</p><p>Two</p>",
        "Title\nOne bold word\nTwo",
    ),
    # entity decode, double-escaped stays text
    (
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;</p>",
        'a & b <tag> "q" \'s\' &lt;',
    ),
    # whitespace collapse
    ("<p>a   b\t c</p>\n\n<p>d</p>", "a b c\nd"),
    ("plain text, no markup", "plain text, no markup"),
]


def test_extraction_cases(spark):
    df = spark.createDataFrame(
        [Row(html=h, want=w) for h, w in CASES]
    ).withColumn("got", html_to_text(F.col("html")))
    bad = df.where(F.col("got") != F.col("want")).collect()
    assert not bad, [(r["html"], r["got"], r["want"]) for r in bad]


def test_duckdb_chain_agrees_on_cases():
    """The oracle chain is GENERATED from the same HTML_STEPS table;
    this pins that the rendering (escaping, 'g' flags, trim) is
    faithful on every extraction case."""
    con = duckdb.connect()
    for html, want in CASES:
        lit = "'" + html.replace("'", "''") + "'"
        got = con.execute("SELECT " + html_to_text_sql(lit)).fetchone()[0]
        assert got == want, (html, got, want)


def test_signals_arithmetic(spark):
    html = (
        '<div><a href="/">Home</a><p>Real body text here</p>'
        '<a href="/b">More links</a></div>'
    )
    row = (
        spark.createDataFrame([Row(html=html)])
        .withColumn("t", html_to_text(F.col("html")))
        .select(*html_signals(F.col("html"), F.col("t")))
        .collect()[0]
    )
    assert row["n_links"] == 2
    assert row["n_tags"] == 8  # div, a, /a, p, /p, a, /a, /div
    assert row["html_chars"] == len(html)
    # anchor text = "HomeMore links" → 13 non-space chars;
    # text = "Home\nReal body text here\nMore links" → 29 non-space
    assert row["link_text_density"] == pytest.approx(13 / 29, abs=1e-6)
    assert 0.0 < row["markup_ratio"] < 1.0


def test_extract_plan_is_narrow(spark):
    """The whole extraction+signals projection must run without an
    Exchange or Python worker — a pure whole-stage projection over the
    scan (the 100 TB contract: markup removal costs one pass)."""
    df = spark.createDataFrame([Row(html="<p>x</p>")])
    out = df.withColumn("t", html_to_text(F.col("html"))).select(
        *html_signals(F.col("html"), F.col("t"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Python", "Join"):
        assert bad not in plan, plan


def test_driver_query_structure(spark, sf_dir):
    from kinesis_vcr_spark.queries.textstats import html_extract_stats
    from kinesis_vcr_spark.tables import load_table

    out = html_extract_stats(spark, sf_dir).collect()
    assert [r["variant"] for r in out] == [0, 1, 2, 3]
    n = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n
    # only the nav-heavy variant carries links
    assert [r["sum_links"] > 0 for r in out] == [False, False, True, False]
    # every variant strips SOME markup
    assert all(r["sum_markup_micro"] > 0 for r in out)
