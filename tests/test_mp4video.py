"""operators/mp4video.py — MP4 video-track metadata tier (synthetic
ISO-BMFF fixtures, the test pattern of the AAC/M4A box walk)."""

from __future__ import annotations

import struct

import pytest

from kinesis_vcr_spark.operators.mp4video import mp4_video_info


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


def _mdhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration) + b"\x55\xc4\x00\x00"
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration) + b"\x55\xc4\x00\x00"
    return _full(b"mdhd", body, version)


def _tkhd(width: int, height: int, version: int = 0) -> bytes:
    if version == 1:
        head = struct.pack(">QQI", 0, 0, 1) + bytes(4) + struct.pack(">Q", 0)
    else:
        head = struct.pack(">III", 0, 0, 1) + bytes(4) + struct.pack(">I", 0)
    body = (
        head
        + bytes(8)  # reserved
        + bytes(2 + 2 + 2 + 2)  # layer, alt group, volume, reserved
        + bytes(36)  # matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    return _full(b"tkhd", body, version)


def _hdlr(kind: bytes) -> bytes:
    return _full(b"hdlr", bytes(4) + kind + bytes(12) + b"h\x00")


def _avc1_entry(width: int, height: int, with_avcc: bool = True) -> bytes:
    visual = (
        bytes(6)
        + struct.pack(">H", 1)  # data_ref_index
        + bytes(2 + 2 + 12)  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4)
        + struct.pack(">H", 1)  # frame_count per sample
        + bytes(32)  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    assert len(visual) == 78
    avcc = _box(b"avcC", bytes([1, 100, 0, 31, 0xFF])) if with_avcc else b""
    return _box(b"avc1", visual + avcc)


def _stsz(n_frames: int) -> bytes:
    return _full(b"stsz", struct.pack(">II", 0, n_frames) + b"".join(
        struct.pack(">I", 100) for _ in range(n_frames)
    ))


def _video_mp4(
    *,
    width=640,
    height=360,
    track_w=1280,
    track_h=720,
    timescale=600,
    duration=3000,
    n_frames=125,
    tkhd_version=0,
    mdhd_version=0,
    with_avcc=True,
) -> bytes:
    stsd = _full(
        b"stsd", struct.pack(">I", 1) + _avc1_entry(width, height, with_avcc)
    )
    stbl = _box(b"stbl", stsd + _stsz(n_frames))
    minf = _box(b"minf", stbl)
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration, mdhd_version) + _hdlr(b"vide") + minf,
    )
    trak = _box(b"trak", _tkhd(track_w, track_h, tkhd_version) + mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    return ftyp + moov


def test_video_info_all_fields():
    info = mp4_video_info(_video_mp4())
    assert info["codec"] == "avc1"
    assert (info["width"], info["height"]) == (640, 360)
    assert (info["track_width"], info["track_height"]) == (1280, 720)
    assert info["n_frames"] == 125
    assert info["duration_s"] == 5.0
    assert info["fps"] == 25.0
    assert info["avc_profile"] == "high"  # profile_idc 100
    assert info["avc_level"] == 3.1  # level_idc 31


def test_version1_boxes():
    info = mp4_video_info(
        _video_mp4(tkhd_version=1, mdhd_version=1, timescale=90000,
                   duration=90000 * 2, n_frames=48)
    )
    assert info["duration_s"] == 2.0
    assert (info["track_width"], info["track_height"]) == (1280, 720)
    assert info["fps"] == 24.0


def test_no_avcc_leaves_profile_null():
    info = mp4_video_info(_video_mp4(with_avcc=False))
    assert info["codec"] == "avc1"
    assert info["avc_profile"] is None
    assert info["avc_level"] is None


def test_audio_only_raises():
    from kinesis_vcr_spark.operators.aac import m4a_info

    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"mp4a",
        bytes(6) + struct.pack(">H", 1) + bytes(8)
        + struct.pack(">HH", 2, 16) + bytes(4)
        + struct.pack(">I", 44100 << 16),
    ))
    stbl = _box(b"stbl", stsd)
    mdia = _box(
        b"mdia", _mdhd(44100, 44100) + _hdlr(b"soun")
        + _box(b"minf", stbl)
    )
    payload = (
        _box(b"ftyp", b"M4A " + bytes(8))
        + _box(b"moov", _box(b"trak", mdia))
    )
    with pytest.raises(ValueError, match="no video"):
        mp4_video_info(payload)
    # and the audio walk still owns this file
    assert m4a_info(payload)["sample_rate"] == 44100


def test_not_mp4_raises():
    with pytest.raises(ValueError, match="no ftyp"):
        mp4_video_info(b"OggS" + bytes(40))


def test_real_decode_surfaces_shape():
    from kinesis_vcr_spark.operators.multimodal import real_decode

    with pytest.raises(
        NotImplementedError, match=r"avc1, 640x360, 125 frames, ~5\.0s"
    ):
        real_decode("video", _video_mp4())
