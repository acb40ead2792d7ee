"""Text-analysis functions: counts, language-ID, quality bounds,
fingerprint determinism."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    predicted_lang,
    quality_score,
    token_count,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([Row(text=text)])
        .select(expr.alias("v"))
        .collect()[0]["v"]
    )


def test_token_counts(spark):
    assert _one(spark, "a b c", token_count(F.col("text"))) == 3
    # BPE-ish: alpha runs, digit runs, single punct glyphs
    assert _one(spark, "hello, world42!", bpe_token_count(F.col("text"))) == 5


def test_predicted_lang(spark):
    assert _one(spark, "der hund ist nicht da und das war gut",
                predicted_lang(F.col("text"))) == "de"
    assert _one(spark, "the cat is on the mat and it is warm",
                predicted_lang(F.col("text"))) == "en"
    assert _one(spark, "le chat est dans le jardin et il dort",
                predicted_lang(F.col("text"))) == "fr"
    # no profile hits anywhere → alphabetical tie-break → 'de'
    assert _one(spark, "zzz qqq xxx", predicted_lang(F.col("text"))) == "de"


def test_quality_score_bounds(spark):
    good = ("the quick brown fox jumps over the lazy dog and it runs far "
            * 5)
    bad = "!!! ### $$$ %%% ^^^"
    qg = _one(spark, good.strip(), quality_score(F.col("text")))
    qb = _one(spark, bad, quality_score(F.col("text")))
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprint_deterministic(spark):
    a = _one(spark, "hello world document", fingerprint(F.col("text")))
    b = _one(spark, "hello world document", fingerprint(F.col("text")))
    c = _one(spark, "another document body", fingerprint(F.col("text")))
    assert a == b
    assert a != c
    assert 0 <= a < 2**31
