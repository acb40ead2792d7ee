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


# ---------------------------------------------------------------------------
# Unicode script profile (E105, r12)
# ---------------------------------------------------------------------------


def test_script_counts_and_dominance(spark):
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    rows = [
        (1, "hello world"),                  # latin
        (2, "привет мир"),                   # cyrillic
        (3, "γειά σου κόσμε"),               # greek
        (4, "مرحبا بالعالم"),                # arabic
        (5, "你好世界"),                      # cjk
        (6, "hello мир"),                    # latin 5 vs cyrillic 3
        (7, "12345 !!!"),                    # none
        (8, "abcд"),                         # 3 latin vs 1 cyrillic
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    counts = script_counts(F.col("t"))
    got = {
        r["id"]: (r["script"], r["lat"], r["cyr"], r["cjk"])
        for r in df.select(
            "id",
            dominant_script(F.col("t")).alias("script"),
            counts["latin"].alias("lat"),
            counts["cyrillic"].alias("cyr"),
            counts["cjk"].alias("cjk"),
        ).collect()
    }
    assert got[1][0] == "latin" and got[1][1] == 10
    assert got[2][0] == "cyrillic" and got[2][2] == 9
    assert got[3][0] == "greek"
    assert got[4][0] == "arabic"
    assert got[5][0] == "cjk" and got[5][3] == 4
    assert got[6][0] == "latin"
    assert got[7][0] == "none"
    assert got[8][0] == "latin"


def test_script_dominance_tie_breaks_by_priority(spark):
    """Equal counts resolve to the earliest SCRIPT_ORDER entry —
    deterministic on both engines (the CASE in the oracle encodes the
    same first-max-in-order rule)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.functions.text import dominant_script

    df = spark.createDataFrame(
        [(1, "abпр"), (2, "пργ"), (3, "γλ中文")],
        "id long, t string",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", dominant_script(F.col("t")).alias("s")
        ).collect()
    }
    assert got[1] == "latin"      # latin 2 == cyrillic 2 -> latin
    assert got[2] == "greek"      # greek 2 beats cyrillic 1 outright
    assert got[3] == "greek"      # greek 2 == cjk 2 -> greek
