"""AVI/MJPEG demux + decode (operators/avi.py): an independent RIFF
writer (from the Microsoft AVI spec, not the parser) builds MJPEG
files from jpeg_ref-encoded frames; tests cover header metadata,
frame extraction, every-n decode, first-frame stats, the Spark
frame-sampling plumbing with REAL frames, and malformed inputs."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from kinesis_vcr_spark.operators.avi import (
    avi_decode_frames,
    avi_frames,
    decode_video,
    sample_avi_frames,
)
from tests.jpeg_ref import encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def write_avi(frames, w, h, fps=10, codec=b"MJPG"):
    """Independent minimal AVI writer: RIFF('AVI ') → hdrl(avih +
    strl(strh+strf)) → movi(00dc...)."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + codec
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + codec + struct.pack(
        "<IIIII", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg_frames(n, w=16, h=16):
    out = []
    for i in range(n):
        img = np.full((h, w), 40 + i * 16, dtype=np.uint8)
        out.append(encode_jpeg(img, quality_divisor=8))
    return out


def test_demux_metadata_and_frames():
    frames = _jpeg_frames(5)
    meta, got = avi_frames(write_avi(frames, 16, 16, fps=25))
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["codec"] == "MJPG"
    assert meta["fps"] == 25.0
    assert meta["n_frames"] == 5
    assert got == frames  # byte-identical demux


def test_decode_every_nth_frame():
    frames = _jpeg_frames(7)
    decoded = list(
        avi_decode_frames(write_avi(frames, 16, 16), every_n=3)
    )
    assert [i for i, *_ in decoded] == [0, 3, 6]
    for i, w, h, px in decoded:
        # flat gray frames decode exactly (quantizer divides the DC)
        assert (w, h) == (16, 16)
        assert np.all(px == 40 + i * 16)


def test_decode_video_stats():
    out = decode_video(write_avi(_jpeg_frames(4), 16, 16, fps=10))
    assert out["n_frames"] == 4
    assert out["codec"] == "MJPG"
    assert out["first_frame_mean"] == 40.0


def test_non_mjpeg_codec_raises():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        list(
            avi_decode_frames(
                write_avi(_jpeg_frames(2), 16, 16, codec=b"H264"),
                every_n=1,
            )
        )


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="RIFF"):
        avi_frames(b"\x89PNG not an avi")
    with pytest.raises(ValueError, match="avih"):
        avi_frames(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_spark_frame_sampling_with_real_frames(spark):
    """The real-codec instantiation of the sample_frames plumbing:
    every kept row carries a decodable JPEG."""
    from kinesis_vcr_spark.operators.jpeg import jpeg_decode

    frames = _jpeg_frames(6)
    media = spark.createDataFrame(
        [
            Row(media_id=1, payload=write_avi(frames, 16, 16)),
            Row(media_id=2, payload=b"not media at all"),
        ]
    )
    rows = sample_avi_frames(media, every_n=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in rows] == [
        (1, 0), (1, 2), (1, 4)
    ]
    for r in rows:
        w, h, px = jpeg_decode(bytes(r["frame"]))
        assert (w, h) == (16, 16)
        assert np.all(px == 40 + r["frame_idx"] * 16)
        assert r["frame_bytes"] == len(bytes(r["frame"]))


def test_movi_before_hdrl_does_not_leak_decoy_stream(
):
    """Chunks seen BEFORE the vids strh (movi LIST first in the file)
    must still resolve to the correct stream: the demuxer buffers data
    chunks and filters against the video stream number after the full
    walk (ADVICE r07). Stream 01's chunks are a decoy that must not
    leak into the frame list; malformed ids ('+1dc') are skipped."""
    frames = _jpeg_frames(2)
    base = write_avi(frames, 16, 16)
    # rebuild: RIFF('AVI ' + movi + hdrl) — movi first, with decoys
    avih_hdrl = base[12:]  # hdrl LIST + movi LIST as written
    # split: hdrl list first in base; recompute from scratch instead
    import struct as _s

    hdrl_len = _s.unpack_from("<I", avih_hdrl, 4)[0]
    hdrl = avih_hdrl[: 8 + hdrl_len + (hdrl_len & 1)]
    movi_body = (
        _chunk(b"01dc", b"DECOYDATA0")
        + _chunk(b"+1dc", b"BADID")
        + b"".join(_chunk(b"00dc", f) for f in frames)
    )
    movi = _list(b"movi", movi_body)
    body = b"AVI " + movi + hdrl
    payload = b"RIFF" + _s.pack("<I", len(body)) + body

    meta, got = avi_frames(payload)
    assert meta["n_frames"] == 2
    assert got == frames  # decoy + malformed ids excluded


def test_no_video_stream_yields_no_frames():
    """A file with data chunks but no vids strh has no video stream —
    frames must be empty, not someone else's chunks."""
    avih = struct.pack("<IIIIIIIIIIIIII", 100, 0, 0, 0x10, 0, 0, 1, 0,
                       16, 16, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih))
    movi = _list(b"movi", _chunk(b"00dc", b"orphan"))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    meta, got = avi_frames(payload)
    assert got == []
    assert meta["n_frames"] == 0


def test_avi_info_header_only_matches_frames_meta():
    """avi_info (the container_info path) returns the same metadata as
    the materializing walk, without slicing a single frame."""
    from kinesis_vcr_spark.operators.avi import avi_info

    payload = write_avi(_jpeg_frames(4), 16, 16, fps=30)
    meta, frames = avi_frames(payload)
    info = avi_info(payload)
    assert info == meta
    assert info["n_frames"] == len(frames) == 4
