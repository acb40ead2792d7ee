"""operators/ogg.py — RFC 3533 page walk + codec identification +
granule-exact duration; Ogg-FLAC full decode by reconstruction."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators import flac as flacmod
from kinesis_vcr_spark.operators.ogg import (
    build_ogg,
    decode_ogg,
    is_ogg,
    ogg_info,
    ogg_packets,
    ogg_pages,
)


def _vorbis_id(channels=2, rate=44100, nominal=128000) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, channels, rate)
        + struct.pack("<iii", -1, nominal, -1)
        + bytes([0xB8, 0x01])
    )


def _opus_head(channels=2, pre_skip=312, input_rate=44100) -> bytes:
    return (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", input_rate)
        + struct.pack("<h", 0)
        + bytes([0])
    )


def _speex_head(rate=16000, channels=1) -> bytes:
    return (
        b"Speex   "
        + b"1.2.0".ljust(20, b"\x00")
        + struct.pack("<IIIII", 1, 80, rate, 2, 4)
        + struct.pack("<I", channels)
        + b"\x00" * 24
    )


def _vorbis_file(n_audio_pages=4, samples_per_page=5120) -> bytes:
    packets = [(_vorbis_id(), 0), (b"\x03vorbis-comment-stub", 0)]
    for i in range(1, n_audio_pages + 1):
        packets.append((b"\x00audio" + bytes(40), i * samples_per_page))
    return build_ogg(packets, serial=7)


def test_vorbis_identification_and_duration():
    payload = _vorbis_file(n_audio_pages=4, samples_per_page=5120)
    assert is_ogg(payload)
    info = ogg_info(payload)
    assert info["codec"] == "vorbis"
    assert info["channels"] == 2
    assert info["sample_rate"] == 44100
    assert info["nominal_bitrate"] == 128000
    assert info["total_samples"] == 4 * 5120
    assert info["duration_s"] == round(4 * 5120 / 44100, 3)
    assert info["n_streams"] == 1


def test_opus_duration_subtracts_pre_skip():
    packets = [
        (_opus_head(channels=1, pre_skip=312), 0),
        (b"OpusTags" + bytes(8), 0),
        (bytes(50), 312 + 48000),  # exactly 1 s of output after skip
    ]
    info = ogg_info(build_ogg(packets, serial=3))
    assert info["codec"] == "opus"
    assert info["channels"] == 1
    assert info["sample_rate"] == 48000  # Opus always decodes at 48 kHz
    assert info["input_sample_rate"] == 44100
    assert info["pre_skip"] == 312
    assert info["total_samples"] == 48000
    assert info["duration_s"] == 1.0


def test_speex_identification():
    packets = [(_speex_head(rate=16000, channels=1), 0), (bytes(20), 16000)]
    info = ogg_info(build_ogg(packets))
    assert info["codec"] == "speex"
    assert info["sample_rate"] == 16000
    assert info["duration_s"] == 1.0


def test_crc_corruption_raises():
    payload = bytearray(_vorbis_file())
    # flip one bit inside the LAST page's body (past its header)
    payload[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_info(bytes(payload))


def test_truncated_page_raises():
    payload = _vorbis_file()
    with pytest.raises(ValueError, match="truncated"):
        list(ogg_pages(payload[:-10]))


def test_not_ogg_raises():
    with pytest.raises(ValueError, match="OggS capture"):
        ogg_info(b"RIFFxxxxWAVE")


def test_chained_stream_raises():
    def chain(serial):
        packets = [(_vorbis_id(), 0), (b"\x00audio" + bytes(40), 4096)]
        return build_ogg(packets, serial=serial)

    with pytest.raises(ValueError, match="chained"):
        list(ogg_packets(chain(7) + chain(8)))
    # same-serial re-chaining is a different loud failure
    with pytest.raises(ValueError, match="duplicate BOS"):
        list(ogg_packets(chain(7) + chain(7)))
    # the metadata tier must refuse too (ADVICE r13): walking on would
    # report only the first chain's duration and inflate n_streams
    with pytest.raises(ValueError, match="chained"):
        ogg_info(chain(7) + chain(8))


def test_single_page_stream_has_duration():
    # one packet, one page: BOS and EOS on the same page — its granule
    # is the stream's final position, so duration must not be None
    payload = build_ogg([(_vorbis_id(), 4096)], serial=3)
    info = ogg_info(payload)
    assert info["n_pages"] == 1
    assert info["total_samples"] == 4096
    assert info["duration_s"] == round(4096 / 44100, 3)


def test_large_packet_spans_pages_roundtrip():
    big = bytes(range(256)) * 400  # 102 400 B > the 65 025 B page cap
    packets_in = [(_vorbis_id(), 0), (big, 4096)]
    got = list(ogg_packets(build_ogg(packets_in, serial=9)))
    assert [p for _, _, p in got] == [_vorbis_id(), big]
    # the big packet's granule rides the page it ENDS on
    assert got[1][1] == 4096
    # and it really did span pages: continuation pages carry -1
    grans = [g for _, g, _, _, _, _ in ogg_pages(build_ogg(packets_in))]
    assert -1 in grans


def test_decode_ogg_vorbis_raises_with_shape():
    with pytest.raises(NotImplementedError, match="vorbis.*44100 Hz.*2 ch"):
        decode_ogg(_vorbis_file())


def _ogg_flac_file(enc: bytes, header_count: int | None = 1):
    """Wrap a native FLAC stream in the Ogg-FLAC 1.0 mapping: the
    identification packet (0x7F FLAC maj min count fLaC STREAMINFO,
    last-flag cleared), one VORBIS_COMMENT header packet, then one
    packet per FLAC frame with cumulative-sample granules."""
    si = flacmod.parse_streaminfo(enc)
    pos = 4
    blocks = []
    while True:
        hdr = enc[pos]
        size = int.from_bytes(enc[pos + 1 : pos + 4], "big")
        blocks.append(enc[pos : pos + 4 + size])
        pos += 4 + size
        if hdr & 0x80:
            break
    streaminfo = blocks[0]
    frames = []
    fpos = si["frames_at"]
    total = 0
    while fpos < len(enc):
        block, new_pos = flacmod._decode_frame(enc, fpos, si)
        total += block.shape[0]
        frames.append((enc[fpos:new_pos], total))
        fpos = new_pos
        if si["total_samples"] and total >= si["total_samples"]:
            break
    ident = (
        b"\x7fFLAC"
        + bytes([1, 0])
        + struct.pack(">H", header_count if header_count else 0)
        + b"fLaC"
        + bytes([streaminfo[0] & 0x7F])  # clear last-metadata flag
        + streaminfo[1:]
    )
    comment = bytes([0x84]) + (12).to_bytes(3, "big") + bytes(12)
    return build_ogg([(ident, 0), (comment, 0), *frames], serial=5)


@pytest.fixture(scope="module")
def native_flac():
    rng = np.random.default_rng(20260816)
    pcm = (rng.integers(-3000, 3000, size=(9000, 2))).astype(np.int64)
    return flacmod.encode_flac(pcm, 44100, bits=16, block_size=4096)


def test_ogg_flac_info(native_flac):
    info = ogg_info(_ogg_flac_file(native_flac))
    assert info["codec"] == "flac"
    assert info["channels"] == 2
    assert info["sample_rate"] == 44100
    assert info["total_samples"] == 9000


def test_ogg_flac_full_decode_matches_native(native_flac):
    n, ch, sr, bits, want = flacmod.decode_flac(native_flac)
    n2, ch2, sr2, bits2, got = decode_ogg(_ogg_flac_file(native_flac))
    assert (n2, ch2, sr2, bits2) == (n, ch, sr, bits)
    assert np.array_equal(got, want)  # MD5 self-check ran inside


def test_ogg_flac_unknown_header_count_uses_frame_sync(native_flac):
    # count 0 = "unknown" per the mapping; the sync-based skip must
    # still separate the comment packet from real frames
    _, _, _, _, want = flacmod.decode_flac(native_flac)
    _, _, _, _, got = decode_ogg(
        _ogg_flac_file(native_flac, header_count=None)
    )
    assert np.array_equal(got, want)


def test_decode_audio_dispatches_ogg(native_flac):
    from kinesis_vcr_spark.operators.multimodal import decode_audio

    out = decode_audio(_ogg_flac_file(native_flac))
    assert out["width"] == 9000
    assert out["height"] == 2
    assert 0.0 < out["mean_value"] < 1.0

    with pytest.raises(NotImplementedError, match="Ogg vorbis"):
        decode_audio(_vorbis_file())


def test_crc_matches_independent_bitserial_implementation():
    """Table-independent second validation source (the repo's codec
    discipline): a straight bit-serial CRC from the RFC 3533 §6 rule
    (poly 0x04C11DB7, init 0, no reflection, no final xor) must agree
    with the table-driven walk on arbitrary pages."""
    import random

    from kinesis_vcr_spark.operators.ogg import ogg_page_crc

    def bitserial(page: bytes) -> int:
        data = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        crc = 0
        for byte in data:
            for bit in range(7, -1, -1):
                top = (crc >> 31) & 1
                crc = (crc << 1) & 0xFFFFFFFF
                if top ^ ((byte >> bit) & 1):
                    crc ^= 0x04C11DB7
        return crc

    rng = random.Random(20260816)
    for size in (27, 60, 300):
        page = bytes(rng.randrange(256) for _ in range(size))
        assert ogg_page_crc(page) == bitserial(page)


def test_edges_crc_policy():
    """ogg_info's default validates the pages it READS (BOS/EOS) and
    skips bulk data-page CRCs; strict mode still checks everything."""
    payload = bytearray(_vorbis_file(n_audio_pages=4))
    # corrupt a MIDDLE data page's body: find the 3rd page boundary
    from kinesis_vcr_spark.operators.ogg import ogg_pages as walk

    spans = []
    pos = 0
    for _h, _g, _s, _q, lac, body in walk(bytes(payload), verify_crc=False):
        pos_end = payload.index(b"OggS", pos + 1) if payload.count(
            b"OggS", pos + 1
        ) else len(payload)
        spans.append((pos, pos_end))
        pos = pos_end
    mid_body_off = spans[3][1] - 1  # last byte of a middle data page
    payload[mid_body_off] ^= 0x01
    corrupted = bytes(payload)

    # edges policy (ogg_info default): mid-page corruption tolerated,
    # metadata still exact
    info = ogg_info(corrupted)
    assert info["codec"] == "vorbis"
    assert info["total_samples"] == 4 * 5120
    # strict policy still catches it
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_info(corrupted, verify_crc=True)
    # and BOS/EOS corruption raises even under edges
    bos_bad = bytearray(_vorbis_file())
    bos_bad[40] ^= 0x01  # inside the first (BOS) page
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_info(bytes(bos_bad))
