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
