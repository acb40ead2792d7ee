"""Verification-free LSH band components (operators/dedup.py
``lsh_band_components``): planted-twin exactness, parity with the
verified path on a bimodal fixture, singleton handling, determinism,
and the linear edge count that is the operator's reason to exist."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.components import connected_components
from kinesis_vcr_spark.operators.dedup import (
    lsh_band_components,
    near_dup_pairs_minhash,
)


def _bimodal(spark, n=60):
    """Distinct bodies + identical twins for every 3rd doc — the
    near-dup signal is unambiguous (J=1 within pairs, noise J≈0)."""
    rows = []
    for i in range(n):
        body = f"document body {i} with its own unmistakable words " + \
               " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((i, body))
        if i % 3 == 0:
            rows.append((1000 + i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_verified_components_on_bimodal_fixture(spark):
    docs = _bimodal(spark)
    got = {
        (r["node"], r["component"])
        for r in lsh_band_components(docs, "doc_id", "text").collect()
    }
    pairs = near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.9)
    comp = connected_components(pairs, "id_a", "id_b")
    expected = {
        (r["node"], r["component"]) for r in comp.collect()
    }
    # every verified-path component assignment appears identically
    assert expected <= got
    # and non-singleton structure is exactly the verified one
    non_single = {t for t in got if t[0] != t[1]}
    exp_non_single = {t for t in expected if t[0] != t[1]}
    assert non_single == exp_non_single
    # singletons carry themselves
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert {t[0] for t in got} == all_ids


def test_boilerplate_cluster_is_one_component_with_linear_edges(spark):
    """The footer-saturated shape that blows up the pair path: m docs
    whose text is dominated by shared boilerplate all fall into ONE
    component, and the operator never materializes a pair table."""
    m = 120
    footer = "all rights reserved subscribe to our newsletter for weekly updates"
    docs = spark.createDataFrame(
        [(i, f"page {i} " + footer) for i in range(m)],
        "doc_id long, text string",
    )
    comp = lsh_band_components(docs, "doc_id", "text").collect()
    roots = {r["component"] for r in comp}
    assert roots == {0}  # one cluster, min id root
    assert len(comp) == m


def test_deterministic_across_runs(spark):
    docs = _bimodal(spark, n=30)
    a = sorted(map(tuple, lsh_band_components(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, lsh_band_components(docs, "doc_id", "text").collect()))
    assert a == b


def test_pipeline_lsh_mode_drops_superset_of_verified(spark, sf_dir):
    """clean-corpus contract of the lsh_components mode: every verified
    band-co-member pair is an lsh edge, so lsh components are COARSER —
    a verified non-root stays a non-root, hence kept(lsh) ⊆
    kept(verified), with equality exactly when no sub-threshold band
    collision exists. Pinned on the e2e fixture where the two modes
    measurably diverge (r10: 168 vs 177 kept at sf0.01)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.queries.e2e import llm_prep_spans

    kept_v = {
        r["doc_id"] for r in llm_prep_spans(spark, sf_dir).collect()
    }
    kept_l = {
        r["doc_id"]
        for r in llm_prep_spans(
            spark, sf_dir, near_dup="lsh_components"
        ).collect()
    }
    assert kept_l <= kept_v
    assert kept_v, "fixture degenerated: verified pipeline kept nothing"


def test_pipeline_rejects_unknown_near_dup_mode(spark):
    import pytest

    from kinesis_vcr_spark.operators.pipeline import llm_prep_corpus

    docs = spark.createDataFrame(
        [(1, "http://a", "<p>x</p>")], "doc_id long, url string, html string"
    )
    with pytest.raises(ValueError, match="near_dup"):
        llm_prep_corpus(docs, docs, near_dup="nope").collect()
