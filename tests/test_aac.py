"""AAC metadata tier (operators/aac.py): synthetic ADTS frame chains
and hand-assembled MP4/M4A box trees — the fixtures are built by an
independent in-test writer (same validation idea as the Layer I/II
spec-rule encoders), plus quarantine-safe failure through the media
feature path."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.operators.aac import (
    ADTS_SAMPLE_RATES,
    aac_info,
    adts_info,
    is_adts,
    is_mp4,
    m4a_info,
)


# ------------------------------------------------------------- ADTS

def _adts_frame(
    payload_len: int, sf_index: int = 4, channels: int = 2,
    profile: int = 1, blocks: int = 1, crc: bool = False,
) -> bytes:
    """One spec-rule ADTS frame: 7/9-byte header + payload_len bytes."""
    header_len = 9 if crc else 7
    frame_len = header_len + payload_len
    h = bytearray(header_len)
    h[0] = 0xFF
    h[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    h[2] = (profile << 6) | (sf_index << 2) | ((channels >> 2) & 1)
    h[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 0x03)
    h[4] = (frame_len >> 3) & 0xFF
    h[5] = ((frame_len & 0x07) << 5) | 0x1F
    h[6] = 0xFC | (blocks - 1)
    return bytes(h) + bytes(payload_len)


def test_adts_walk_counts_frames_and_duration():
    stream = (
        _adts_frame(100) + _adts_frame(100) + _adts_frame(100, blocks=2)
    )
    info = adts_info(stream)
    assert info["codec"] == "aac"
    assert info["profile"] == "AAC LC"
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["n_frames"] == 3
    # 1 + 1 + 2 raw data blocks x 1024 samples at 44100 Hz
    assert info["duration_s"] == round(4 * 1024 / 44100, 6)
    assert info["vbr"] is False  # same frame_length throughout


def test_adts_vbr_and_crc_header():
    stream = _adts_frame(100) + _adts_frame(200, crc=True)
    info = adts_info(stream)
    assert info["n_frames"] == 2
    assert info["vbr"] is True


def test_adts_truncated_final_frame_counts_intact_only():
    stream = _adts_frame(100) + _adts_frame(100)[:50]
    assert adts_info(stream)["n_frames"] == 1


def test_adts_rejects_reserved_rate_and_bad_length():
    with pytest.raises(ValueError, match="reserved"):
        adts_info(_adts_frame(10, sf_index=13))
    bad = bytearray(_adts_frame(10))
    bad[3] &= 0xC0
    bad[4] = 0
    bad[5] = 0x1F  # frame_length 0 < header
    with pytest.raises(ValueError, match="shorter than its header"):
        adts_info(bytes(bad))
    with pytest.raises(ValueError, match="no ADTS sync"):
        adts_info(b"\x00\x01\x02")


def test_adts_is_not_misread_as_mp3():
    """ADTS shares the 0xFF lead with MPEG audio; the layer-'00' bits
    must route it to the AAC tier, not the mp3 walk."""
    assert is_adts(_adts_frame(10))
    from kinesis_vcr_spark.operators.mp3 import _parse_header

    h = int.from_bytes(_adts_frame(10)[:4], "big")
    assert _parse_header(h) is None  # layer 00 is reserved in MPEG audio


# -------------------------------------------------------------- M4A

def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _esds(oti: int = 0x40, aot: int = 2) -> bytes:
    """esds box: ES_Descriptor > DecoderConfigDescriptor >
    DecoderSpecificInfo (AudioSpecificConfig with the given AOT)."""
    asc = bytes([(aot << 3) | 0x02, 0x10])  # aot + freq-index hi bits
    dsi = bytes([0x05, len(asc)]) + asc
    dcd_body = bytes([oti, 0x15]) + b"\x00" * 11 + dsi
    dcd = bytes([0x04, len(dcd_body)]) + dcd_body
    es_body = b"\x00\x01" + b"\x00" + dcd  # ES_ID + flags + children
    es = bytes([0x03, len(es_body)]) + es_body
    return _box(b"esds", b"\x00\x00\x00\x00" + es)


def _m4a(
    timescale: int = 44100, duration: int = 441000,
    channels: int = 2, rate: int = 44100, oti: int = 0x40,
) -> bytes:
    mp4a_body = (
        b"\x00" * 6 + (1).to_bytes(2, "big")       # SampleEntry
        + b"\x00" * 8                               # version/revision/vendor
        + channels.to_bytes(2, "big")
        + (16).to_bytes(2, "big")                   # samplesize
        + b"\x00" * 4
        + (rate << 16).to_bytes(4, "big")           # 16.16 fixed
        + _esds(oti=oti)
    )
    stsd = _box(
        b"stsd", b"\x00\x00\x00\x00" + (1).to_bytes(4, "big")
        + _box(b"mp4a", mp4a_body)
    )
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        + b"\x00" * 4,
    )
    hdlr = _box(
        b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"M4A " + b"\x00\x00\x00\x00" + b"isom")
    return ftyp + moov


def test_m4a_box_walk_reads_aac_track():
    info = m4a_info(_m4a())
    assert info["codec"] == "aac"
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["duration_s"] == 10.0
    assert info["audio_object_type"] == 2  # AAC LC
    assert aac_info(_m4a()) == info  # dispatch


def test_m4a_non_aac_oti_surfaces_as_oti():
    info = m4a_info(_m4a(oti=0x6B))  # MP3-in-MP4
    assert info["codec"] == "oti_0x6b"


def test_m4a_malformed_fails_loud():
    with pytest.raises(ValueError, match="no ftyp"):
        m4a_info(b"\x00" * 16)
    assert is_mp4(_m4a())
    ftyp_only = _box(b"ftyp", b"M4A \x00\x00\x00\x00isom")
    with pytest.raises(ValueError, match="no moov"):
        m4a_info(ftyp_only)
    # box size overrunning its container is structural corruption
    corrupt = bytearray(_m4a())
    # ftyp is 20 bytes; moov's size field follows at offset 20
    corrupt[20:24] = (1 << 30).to_bytes(4, "big")  # moov size: absurd
    with pytest.raises(ValueError, match="overruns"):
        m4a_info(bytes(corrupt))


# ------------------------------------ media-path quarantine contract

def test_decode_audio_raises_documented_slot_with_shape():
    from kinesis_vcr_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="aac, 44100 Hz, 2 ch"):
        decode_audio(_adts_frame(100))
    with pytest.raises(NotImplementedError, match="~10.0s"):
        decode_audio(_m4a())


def test_feature_path_quarantines_aac(spark):
    """extract_media_features(on_error='null') must null AAC rows (the
    crawl posture), not die — NotImplementedError is in the shared
    malformed contract."""
    from pyspark.sql import Row

    from kinesis_vcr_spark.operators.multimodal import (
        extract_media_features,
        real_decode,
    )

    from kinesis_vcr_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame([
        Row(media_id=1, kind="audio", payload=bytearray(_adts_frame(50)),
            meta={}),
        Row(media_id=2, kind="audio", payload=bytearray(_m4a()), meta={}),
    ], MEDIA_SCHEMA)
    rows = {
        r["media_id"]: r
        for r in extract_media_features(
            media, decoder=real_decode, on_error="null"
        ).collect()
    }
    assert rows[1]["width"] is None and rows[2]["width"] is None
    assert rows[1]["payload_bytes"] == 57


# ---------------------------------------------------------------------------
# AudioSpecificConfig extension parse — HE-AAC detection (r13, item 7)
# ---------------------------------------------------------------------------


def _bits(*fields) -> bytes:
    """Pack (value, width) fields MSB-first, zero-padded to bytes."""
    acc, n = 0, 0
    for v, w in fields:
        acc = (acc << w) | v
        n += w
    pad = (-n) % 8
    return ((acc << pad)).to_bytes((n + pad) // 8, "big")


def _esds_asc(asc: bytes, oti: int = 0x40) -> bytes:
    dsi = bytes([0x05, len(asc)]) + asc
    dcd_body = bytes([oti, 0x15]) + b"\x00" * 11 + dsi
    dcd = bytes([0x04, len(dcd_body)]) + dcd_body
    es_body = b"\x00\x01" + b"\x00" + dcd
    es = bytes([0x03, len(es_body)]) + es_body
    return _box(b"esds", b"\x00\x00\x00\x00" + es)


def test_asc_plain_lc():
    from kinesis_vcr_spark.operators.aac import parse_audio_specific_config

    got = parse_audio_specific_config(bytes([0x12, 0x10]))  # canonical
    assert got["audio_object_type"] == 2
    assert got["base_object_type"] == 2
    assert got["sampling_rate"] == 44100
    assert got["channel_configuration"] == 2
    assert got["profile"] == "AAC LC"
    assert not got["sbr"] and not got["ps"]
    assert got["extension_sampling_rate"] is None


def test_asc_he_aac_sbr():
    """AOT 5 (SBR): core rate + extension (post-SBR) rate + base AOT."""
    from kinesis_vcr_spark.operators.aac import parse_audio_specific_config

    asc = _bits((5, 5), (7, 4), (2, 4), (4, 4), (2, 5))
    got = parse_audio_specific_config(asc)
    assert got["audio_object_type"] == 5
    assert got["base_object_type"] == 2
    assert got["sampling_rate"] == 22050
    assert got["extension_sampling_rate"] == 44100
    assert got["profile"] == "HE-AAC"
    assert got["sbr"] and not got["ps"]


def test_asc_he_aac_v2_ps():
    from kinesis_vcr_spark.operators.aac import parse_audio_specific_config

    asc = _bits((29, 5), (7, 4), (1, 4), (4, 4), (2, 5))
    got = parse_audio_specific_config(asc)
    assert got["profile"] == "HE-AACv2"
    assert got["sbr"] and got["ps"]
    assert got["extension_sampling_rate"] == 44100


def test_asc_escapes():
    """AOT 31+escape and samplingFrequencyIndex 15 + explicit 24-bit."""
    from kinesis_vcr_spark.operators.aac import parse_audio_specific_config

    asc = _bits((31, 5), (34 - 32, 6), (15, 4), (12345, 24), (1, 4))
    got = parse_audio_specific_config(asc)
    assert got["audio_object_type"] == 34
    assert got["sampling_rate"] == 12345
    assert got["channel_configuration"] == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reserved"):
        parse_audio_specific_config(_bits((2, 5), (13, 4), (2, 4)))


def _m4a_with_esds(esds: bytes, channels: int = 2,
                   rate: int = 22050) -> bytes:
    """_m4a with a caller-supplied esds box (all box sizes rebuilt)."""
    mp4a_body = (
        b"\x00" * 6 + (1).to_bytes(2, "big")
        + b"\x00" * 8
        + channels.to_bytes(2, "big")
        + (16).to_bytes(2, "big")
        + b"\x00" * 4
        + (rate << 16).to_bytes(4, "big")
        + esds
    )
    stsd = _box(
        b"stsd", b"\x00\x00\x00\x00" + (1).to_bytes(4, "big")
        + _box(b"mp4a", mp4a_body)
    )
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + (22050).to_bytes(4, "big") + (220500).to_bytes(4, "big")
        + b"\x00" * 4,
    )
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    moov = _box(b"moov", _box(b"trak", mdia))
    ftyp = _box(b"ftyp", b"M4A " + b"\x00\x00\x00\x00" + b"isom")
    return ftyp + moov


def test_m4a_reports_he_profile():
    """The MP4 tier distinguishes LC from HE without decoding: an
    HE-AAC esds reports profile/sbr/ps + the post-SBR output rate;
    the plain LC path now reports its profile too."""
    he_asc = _bits((5, 5), (7, 4), (2, 4), (4, 4), (2, 5))
    info = m4a_info(_m4a_with_esds(_esds_asc(he_asc)))
    assert info["codec"] == "aac"
    assert info["profile"] == "HE-AAC"
    assert info["sbr"] and not info["ps"]
    assert info["extension_sampling_rate"] == 44100
    assert info["audio_object_type"] == 5

    v2_asc = _bits((29, 5), (7, 4), (1, 4), (4, 4), (2, 5))
    info2 = m4a_info(_m4a_with_esds(_esds_asc(v2_asc), channels=1))
    assert info2["profile"] == "HE-AACv2"
    assert info2["sbr"] and info2["ps"]

    info_lc = m4a_info(_m4a())
    assert info_lc["profile"] == "AAC LC"
    assert not info_lc["sbr"] and info_lc["extension_sampling_rate"] is None
