"""The composed llm_prep_spans query (queries/e2e.py): the fixture
pins that the planted shared footer keeps the span stage non-vacuous
(the E2E_SPAN_L docstring's claim) and that the output is the kept
set with sane span accounting."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spans_rows(spark):
    q = all_queries()["llm_prep_spans"].spark_fn
    return q(spark, SF_DIR).collect()


def test_footer_plant_keeps_span_stage_non_vacuous(spans_rows):
    """Every kept doc carries the planted footer, so every row must
    have at least one duplicated span — an all-zero n_spans column
    means the plant or the span stage silently broke."""
    assert len(spans_rows) > 0
    assert all(r.n_spans >= 1 for r in spans_rows)


def test_span_accounting_is_consistent(spans_rows):
    for r in spans_rows:
        # removal can only shrink, and exactly by the duplicated chars
        assert r.dup_chars >= 1
        assert r.clean_len >= 0
        assert len(r.clean_md5) == 32
        # splits only ever come from the kept branch
        assert r.split in ("train", "val", "test")


def test_rows_match_pipeline_kept_count(spark, spans_rows):
    """The spans query's population IS llm_prep_pipeline's kept set."""
    from pyspark.sql import functions as F

    pipe = all_queries()["llm_prep_pipeline"].spark_fn(spark, SF_DIR)
    # NOTE: llm_prep_spans plants the footer, which shifts quality
    # scores, so the kept POPULATIONS differ between the two queries
    # by design — only sanity-compare magnitudes here, identity is
    # value-checked by the shared-prefix oracle.
    kept_pipe = (
        pipe.where(F.col("status") == "kept")
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    ) or 0
    assert len(spans_rows) > 0
    assert len(spans_rows) >= kept_pipe  # footer raises quality scores


# ------------------------- boilerplate-first ordering (r11, path c)

@pytest.fixture(scope="module")
def clean_rows(spark):
    q = all_queries()["llm_prep_spans_clean"].spark_fn
    return q(spark, SF_DIR).collect()


def test_clean_ordering_strips_footer_before_near_dup(spark, clean_rows):
    """Line dedup runs FIRST, so no kept doc's cleaned text contains
    the footer sentence — the whole point of path (c): the near-dup
    stage never sees the corpus-wide boilerplate."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.functions.html import html_to_text
    from kinesis_vcr_spark.functions.text import canonicalize_text
    from kinesis_vcr_spark.operators.linededup import dedup_lines
    from kinesis_vcr_spark.queries.e2e import (
        E2E_BENCH_MOD,
        E2E_FOOTER,
        E2E_LINE_MIN,
        _injected,
    )
    from kinesis_vcr_spark.tables import load_table

    assert len(clean_rows) > 0
    injected = _injected(load_table(spark, SF_DIR, "documents")).withColumn(
        "html",
        F.when(
            F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0, F.col("html")
        ).otherwise(F.concat(F.col("html"), F.lit(E2E_FOOTER))),
    )
    raw = injected.withColumn(
        "__raw", canonicalize_text(html_to_text(F.col("html")))
    )
    cleaned = dedup_lines(
        raw.select("doc_id", "__raw"), "doc_id",
        F.split(F.col("__raw"), "\n"), min_docs=E2E_LINE_MIN,
    )
    with_footer = cleaned.where(
        F.col("clean_text").contains("All rights reserved worldwide")
    ).count()
    assert with_footer == 0
    # and the raw corpus DID carry it (the plant is live)
    assert raw.where(
        F.col("__raw").contains("All rights reserved worldwide")
    ).count() > 0


def test_clean_ordering_output_contract(clean_rows):
    for r in clean_rows:
        assert r.split in ("train", "val", "test")
        assert r.n_spans >= 0 and r.dup_chars >= 0
        assert len(r.clean_md5) == 32
