"""Multimodal plumbing: mapInPandas schema/batching, stub decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kinesis_vcr_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    documents_as_media,
    extract_media_features,
    fake_decode,
)
from kinesis_vcr_spark.tables import load_table


def test_stub_decoders_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_fake_decode_deterministic():
    f1 = fake_decode("image", b"abcdef" * 100)
    f2 = fake_decode("image", b"abcdef" * 100)
    assert f1 == f2
    assert f1["width"] * f1["height"] <= 600
    audio = fake_decode("audio", b"x" * 640)
    assert audio["width"] == 20 and audio["height"] == 1


def test_extract_features_over_media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"\x00\x01\x02\x03" * 25,
            meta={"fmt": "raw"}),
        Row(media_id=2, kind="audio", payload=b"\xff" * 64, meta={}),
        Row(media_id=3, kind="video", payload=b"", meta=None),
    ]
    media = spark.createDataFrame(rows)
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["payload_bytes"] == 100
    assert feats[1]["width"] == 10 and feats[1]["height"] == 10
    assert feats[1]["mean_value"] == 1.5
    assert feats[2]["mean_value"] == 255.0
    assert feats[3]["payload_bytes"] == 0 and feats[3]["mean_value"] == 0.0


def test_documents_as_media_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    feats = extract_media_features(media)
    row = feats.orderBy("media_id").first()
    assert row["payload_bytes"] > 0


def test_sample_frames_geometry(spark):
    from kinesis_vcr_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [
            (1, "video", b"x" * 100, {}),   # 4 frames: idx 0 kept (e=4)
            (2, "video", b"y" * 270, {}),   # 9 frames: idx 0,4,8 kept
            (3, "video", b"", {}),          # empty payload: 1 empty frame
        ],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in sample_frames(media, every_n=4).collect()
    }
    assert set(rows) == {(1, 0), (2, 0), (2, 4), (2, 8), (3, 0)}
    assert rows[(1, 0)]["frame_bytes"] == 32
    assert rows[(2, 8)]["frame_bytes"] == 270 - 8 * 32  # short tail
    assert rows[(3, 0)]["frame_bytes"] == 0
    assert rows[(2, 4)]["frame"] == b"y" * 32


def test_resize_media_schema_roundtrip(spark):
    from kinesis_vcr_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, "image", b"abc", {"k": "v"}), (2, "image", None, None)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = resize_media(media, 4, 4)
    rows = {r["media_id"]: r for r in out.collect()}
    assert bytes(rows[1]["payload"]) == (b"abc" * 6)[:16]
    assert rows[1]["meta"]["resized"] == "4x4"
    assert rows[1]["meta"]["k"] == "v"
    assert bytes(rows[2]["payload"]) == b"\x00" * 16
    # output schema round-trips into other media operators
    assert sample_frames(out, every_n=1).count() == 2
