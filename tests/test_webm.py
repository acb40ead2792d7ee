"""operators/webm.py — EBML walk, track metadata, lacing-aware frame
counts (synthetic spec-rule fixtures, the build_ogg test pattern)."""

from __future__ import annotations

import struct

import pytest

from kinesis_vcr_spark.operators.webm import (
    ebml_element,
    ebml_float,
    ebml_uint,
    is_webm,
    webm_info,
)

EBML_HDR = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TRACKS = 0x1654AE6B
CLUSTER = 0x1F43B336
TRACK_ENTRY = 0xAE
TIMECODE_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
AUDIO = 0xE1
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
SAMPLING_FREQ = 0xB5
CHANNELS = 0x9F
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
TIMECODE = 0xE7


def _header() -> bytes:
    return ebml_element(EBML_HDR, ebml_element(0x4282, b"webm"))


def _video_track(number=1, codec=b"V_VP9", w=640, h=360) -> bytes:
    return ebml_element(
        TRACK_ENTRY,
        ebml_uint(TRACK_NUMBER, number)
        + ebml_uint(TRACK_TYPE, 1)
        + ebml_element(CODEC_ID, codec)
        + ebml_element(
            VIDEO, ebml_uint(PIXEL_WIDTH, w) + ebml_uint(PIXEL_HEIGHT, h)
        ),
    )


def _audio_track(number=2, codec=b"A_OPUS", rate=48000.0, ch=2) -> bytes:
    return ebml_element(
        TRACK_ENTRY,
        ebml_uint(TRACK_NUMBER, number)
        + ebml_uint(TRACK_TYPE, 2)
        + ebml_element(CODEC_ID, codec)
        + ebml_element(
            AUDIO, ebml_float(SAMPLING_FREQ, rate) + ebml_uint(CHANNELS, ch)
        ),
    )


def _simple_block(track: int, lacing: int = 0, laces: int = 0) -> bytes:
    # track vint (1 byte form), 2-byte timecode, flags; optional lace
    # count byte + Xiph lace sizes for lacing
    body = bytes([0x80 | track]) + struct.pack(">h", 0)
    if lacing == 0:
        body += bytes([0x00]) + b"\xaa" * 10
    else:
        body += bytes([lacing << 1, laces]) + bytes([5] * laces) + bytes(
            5 * (laces + 1)
        )
    return ebml_element(SIMPLE_BLOCK, body)


def _webm(
    *,
    duration_ticks=2000.0,
    timecode_scale=None,
    video_blocks=3,
    laced_block_laces=None,
    audio_blocks=2,
    use_block_group=False,
    unknown_segment_size=False,
) -> bytes:
    info_body = b""
    if timecode_scale is not None:
        info_body += ebml_uint(TIMECODE_SCALE, timecode_scale)
    info_body += ebml_float(DURATION, duration_ticks)
    tracks = ebml_element(TRACKS, _video_track() + _audio_track())
    blocks = b""
    for _ in range(video_blocks):
        blocks += _simple_block(1)
    if laced_block_laces is not None:
        blocks += _simple_block(1, lacing=1, laces=laced_block_laces)
    for _ in range(audio_blocks):
        if use_block_group:
            inner = ebml_element(
                BLOCK, bytes([0x82]) + struct.pack(">h", 0) + bytes([0]) + b"x"
            )
            blocks += ebml_element(BLOCK_GROUP, inner)
        else:
            blocks += _simple_block(2)
    cluster = ebml_element(CLUSTER, ebml_uint(TIMECODE, 0) + blocks)
    seg_body = ebml_element(INFO, info_body) + tracks + cluster
    if unknown_segment_size:
        segment = bytes.fromhex("18538067") + b"\xff" + seg_body
    else:
        segment = ebml_element(SEGMENT, seg_body)
    return _header() + segment


def test_tracks_and_duration():
    info = webm_info(_webm())
    assert is_webm(_webm())
    assert info["duration_s"] == 2.0  # 2000 ticks × 1 ms default scale
    assert info["timecode_scale_ns"] == 1_000_000
    v, a = info["tracks"]
    assert (v["type"], v["codec_id"], v["width"], v["height"]) == (
        "video", "V_VP9", 640, 360,
    )
    assert (a["type"], a["codec_id"], a["sample_rate"], a["channels"]) == (
        "audio", "A_OPUS", 48000.0, 2,
    )
    assert v["n_frames"] == 3
    assert a["n_frames"] == 2
    assert info["n_clusters"] == 1


def test_custom_timecode_scale():
    info = webm_info(_webm(timecode_scale=100_000, duration_ticks=50_000.0))
    assert info["duration_s"] == 5.0


def test_lacing_expands_frame_count():
    # a Xiph-laced block with lace-count 3 carries 4 frames
    info = webm_info(_webm(video_blocks=2, laced_block_laces=3))
    assert info["tracks"][0]["n_frames"] == 2 + 4


def test_block_group_counts():
    info = webm_info(_webm(audio_blocks=3, use_block_group=True))
    assert info["tracks"][1]["n_frames"] == 3


def test_unknown_size_segment_supported():
    info = webm_info(_webm(unknown_segment_size=True))
    assert info["duration_s"] == 2.0
    assert info["tracks"][0]["n_frames"] == 3


def test_unknown_size_cluster_raises():
    # hand-build: unsized cluster inside a sized segment
    cluster = bytes.fromhex("1F43B336") + b"\xff" + _simple_block(1)
    seg = ebml_element(
        SEGMENT,
        ebml_element(INFO, ebml_float(DURATION, 1000.0))
        + ebml_element(TRACKS, _video_track())
        + cluster,
    )
    with pytest.raises(ValueError, match="unknown-size"):
        webm_info(_header() + seg)


def test_truncation_raises():
    payload = _webm()
    with pytest.raises(ValueError, match="overruns|truncated"):
        webm_info(payload[:-6])


def test_not_webm_raises():
    with pytest.raises(ValueError, match="EBML header"):
        webm_info(b"OggS" + bytes(20))


def test_real_decode_surfaces_shape():
    from kinesis_vcr_spark.operators.multimodal import real_decode

    with pytest.raises(
        NotImplementedError, match=r"V_VP9, 640x360, 3 frames, ~2\.0s"
    ):
        real_decode("video", _webm())
