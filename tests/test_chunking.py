"""Sliding-window document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kinesis_vcr_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _text(n):
    return " ".join(f"t{i}" for i in range(n))


def test_coverage_and_overlap(spark):
    """Every token appears in some chunk; consecutive chunks share
    exactly `overlap` tokens; reconstruction from stride-prefixes
    yields the original token sequence."""
    toks = _text(100).split(" ")
    chunks = sorted(
        chunk_documents(
            _docs(spark, [(0, _text(100))]),
            window_tokens=32, overlap_tokens=8,
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    seqs = [r.chunk_text.split(" ") for r in chunks]
    # stride arithmetic: ceil((100-8)/24) = 4 chunks
    assert len(seqs) == 4
    for a, b in zip(seqs, seqs[1:]):
        assert a[-8:] == b[:8]  # exact overlap
    rebuilt = seqs[0] + [t for s in seqs[1:] for t in s[8:]]
    assert rebuilt == toks


def test_short_doc_single_chunk(spark):
    rows = chunk_documents(
        _docs(spark, [(0, "just five little tokens here")]),
        window_tokens=32, overlap_tokens=8,
    ).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_chunk_tokens == 5


def test_no_overlap_partitions_exactly(spark):
    chunks = chunk_documents(
        _docs(spark, [(0, _text(70))]), window_tokens=32, overlap_tokens=0
    ).collect()
    sizes = sorted((r.chunk_id, r.n_chunk_tokens) for r in chunks)
    assert sizes == [(0, 32), (1, 32), (2, 6)]  # clean partition + tail


def test_invalid_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(
            _docs(spark, [(0, "x")]), window_tokens=8, overlap_tokens=8
        )
