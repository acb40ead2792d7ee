"""Corpus ingestion with quarantine (sources/corpus.py)."""

from __future__ import annotations

import gzip

from pyspark.sql import types as T

from kinesis_vcr_spark.sources.corpus import (
    ingest_report,
    read_csv,
    read_jsonl,
    split_quarantine,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "hola", "lang": "es"}',
]
BAD = [
    '{"doc_id": 3, "text": "unterminated',
    "not json at all",
]


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    df = read_jsonl(spark, str(p), SCHEMA)
    clean, bad = split_quarantine(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert "_corrupt_record" not in clean.columns
    raws = {r.raw for r in bad.collect()}
    assert raws == set(BAD)  # raw text preserved for re-parse/logging


def test_jsonl_gzip_transparent(spark, tmp_path):
    p = tmp_path / "corpus.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(GOOD) + "\n")
    clean, bad = split_quarantine(read_jsonl(spark, str(p), SCHEMA))
    assert clean.count() == 2 and bad.count() == 0


def test_ingest_report_counts(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    r = ingest_report(read_jsonl(spark, str(p), SCHEMA)).collect()[0]
    assert r.n_clean == 2 and r.n_quarantined == 2


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "oops,this-id-is-not-a-long,xx\n"
        "2,world,es\n"
    )
    clean, bad = split_quarantine(
        read_csv(spark, str(p), SCHEMA, header=True)
    )
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1
