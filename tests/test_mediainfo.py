"""operators/mediainfo.py — unified container sniff + the Arrow-
batched container_stats operator."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from kinesis_vcr_spark.operators.mediainfo import (
    CONTAINER_SCHEMA,
    container_info,
    container_stats,
)


def _wav(n_frames=8000, rate=16000, channels=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x01\x02" * n_frames * channels)
    return buf.getvalue()


def _flac() -> bytes:
    from kinesis_vcr_spark.operators.flac import encode_flac

    rng = np.random.default_rng(7)
    pcm = rng.integers(-1000, 1000, size=(4410, 1)).astype(np.int64)
    return encode_flac(pcm, 44100, bits=16, block_size=4096)


def _ogg_opus() -> bytes:
    from kinesis_vcr_spark.operators.ogg import build_ogg

    head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )
    return build_ogg(
        [(head, 0), (b"OpusTags" + bytes(4), 0), (bytes(30), 96000)]
    )


def _webm() -> bytes:
    from kinesis_vcr_spark.operators.webm import (
        ebml_element,
        ebml_float,
        ebml_uint,
    )

    video = ebml_element(
        0xAE,
        ebml_uint(0xD7, 1) + ebml_uint(0x83, 1)
        + ebml_element(0x86, b"V_VP8")
        + ebml_element(0xE0, ebml_uint(0xB0, 320) + ebml_uint(0xBA, 240)),
    )
    block = ebml_element(0xA3, bytes([0x81]) + struct.pack(">h", 0)
                         + bytes([0]) + b"f")
    seg = ebml_element(
        0x18538067,
        ebml_element(0x1549A966, ebml_float(0x4489, 4000.0))
        + ebml_element(0x1654AE6B, video)
        + ebml_element(0x1F43B336, ebml_uint(0xE7, 0) + block * 2),
    )
    return ebml_element(0x1A45DFA3, ebml_element(0x4282, b"webm")) + seg


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _m4a() -> bytes:
    stsd = _box(
        b"stsd",
        bytes([0, 0, 0, 0]) + struct.pack(">I", 1) + _box(
            b"mp4a",
            bytes(6) + struct.pack(">H", 1) + bytes(8)
            + struct.pack(">HH", 2, 16) + bytes(4)
            + struct.pack(">I", 22050 << 16),
        ),
    )
    mdia = _box(
        b"mdia",
        _box(b"mdhd", bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, 22050, 44100)
             + b"\x55\xc4\x00\x00")
        + _box(b"hdlr", bytes(4) + bytes(4) + b"soun" + bytes(12) + b"h\x00")
        + _box(b"minf", _box(b"stbl", stsd)),
    )
    return (
        _box(b"ftyp", b"M4A " + bytes(8))
        + _box(b"moov", _box(b"trak", mdia))
    )


def _adts() -> bytes:
    def frame(payload_len=100, sf_index=4):
        frame_len = 7 + payload_len
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1
        h[2] = (1 << 6) | (sf_index << 2)
        h[3] = (2 << 6) | ((frame_len >> 11) & 0x03)
        h[4] = (frame_len >> 3) & 0xFF
        h[5] = ((frame_len & 0x07) << 5) | 0x1F
        h[6] = 0xFC
        return bytes(h) + bytes(payload_len)

    return frame() * 3


def test_wav():
    info = container_info(_wav())
    assert info["container"] == "wav"
    assert info["codec"] == "pcm"
    assert info["channels"] == 1
    assert info["sample_rate"] == 16000
    assert info["n_frames"] == 8000
    assert info["duration_s"] == 0.5


def test_flac():
    info = container_info(_flac())
    assert (info["container"], info["codec"]) == ("flac", "flac")
    assert info["n_frames"] == 4410
    assert info["duration_s"] == 0.1


def test_ogg_opus():
    info = container_info(_ogg_opus())
    assert (info["container"], info["codec"]) == ("ogg", "opus")
    assert info["duration_s"] == 2.0
    assert info["sample_rate"] == 48000


def test_webm():
    info = container_info(_webm())
    assert (info["container"], info["codec"]) == ("webm", "V_VP8")
    assert (info["width"], info["height"]) == (320, 240)
    assert info["duration_s"] == 4.0
    assert info["n_frames"] == 2


def test_m4a_audio_fallback():
    info = container_info(_m4a())
    assert info["container"] == "mp4"
    assert info["sample_rate"] == 22050
    assert info["channels"] == 2
    assert info["duration_s"] == 2.0


def test_adts():
    info = container_info(_adts())
    assert (info["container"], info["codec"]) == ("adts", "aac")
    assert info["n_frames"] == 3


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="unrecognized container"):
        container_info(b"\x00\x01\x02\x03" + bytes(20))


def test_container_stats_spark(spark):
    from kinesis_vcr_spark.operators.multimodal import MEDIA_SCHEMA

    from tests.jpeg_ref import encode_jpeg
    from tests.test_avi import write_avi

    img = np.full((16, 16), 80, dtype=np.uint8)
    avi = write_avi([encode_jpeg(img, quality_divisor=8)] * 3, 16, 16, fps=10)
    rows = [
        (1, "audio", _wav(), None),
        (2, "audio", _flac(), None),
        (3, "audio", _ogg_opus(), None),
        (4, "video", _webm(), None),
        (5, "audio", _m4a(), None),
        (6, "audio", b"garbage-bytes-here-not-a-container", None),
        (7, "audio", _adts(), None),
        (8, "video", avi, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = container_stats(media)
    assert out.schema == CONTAINER_SCHEMA
    got = {r["media_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 8
    assert got[1]["container"] == "wav"
    assert got[2]["codec"] == "flac"
    assert got[3]["codec"] == "opus"
    assert got[4]["codec"] == "V_VP8"
    assert got[5]["sample_rate"] == 22050
    assert got[6]["container"] == "error"
    assert got[6]["duration_s"] is None
    assert got[6]["payload_bytes"] == 34
    assert got[7]["n_frames"] == 3
    assert got[8]["container"] == "avi"
    assert got[8]["codec"] == "MJPG"
    assert got[8]["n_frames"] == 3
    assert got[8]["duration_s"] == 0.3
