"""MP3 (MPEG audio) frame-header metadata — container typing and
duration estimation WITHOUT decoding.

Full MPEG-audio DECODE stays the documented ffmpeg/soundfile slot for
the same reason as lossy VP8 (operators/webp.py
``vp8_key_frame_dimensions``): Layer III rests on large tabulated spec
constants (the 512-coefficient synthesis window, Huffman tables,
scalefactor band layouts) that cannot be validated in this container —
no reference decoder exists here to produce golden vectors, and a
round-trip against an in-repo encoder sharing the same transcribed
tables cannot detect a mistranscription. The frame HEADER, by
contrast, is 4 bytes of bit fields plus two small, widely-replicated
lookup tables (ISO/IEC 11172-3 §2.4.1.3 / 13818-3) — fully verifiable
with hand-built fixtures — and already answers what a corpus pipeline
asks of compressed audio it is not going to decode: codec version,
layer, bitrate, sample rate, channel mode, frame count, duration.

``mp3_frame_info`` skips an ID3v2 prefix (synchsafe size), locates the
first sync word, validates the header, and WALKS the frame chain using
the exact per-frame byte size (``144·bitrate/rate + padding`` for
MPEG-1 Layer III etc.), so the frame count is a structural check of
the whole stream, not a guess from the first header. Variable-bitrate
streams are handled by summing per-frame durations (each frame
declares its own bitrate).

Reference anchor: no audio surface in the reference (SURVEY.md §2.5a
E-series extension, multimodal family metadata tier).
"""

from __future__ import annotations

from typing import Any

#: bitrate tables in kbps, index = header bitrate_index (0 = free, 15
#: = invalid). Keyed by (version_group, layer): version_group "1" =
#: MPEG-1, "2" = MPEG-2/2.5 (which share tables).
_BITRATES = {
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384],
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
}

#: sample-rate tables in Hz, index = header sampling_frequency.
_RATES = {
    "MPEG1": [44100, 48000, 32000],
    "MPEG2": [22050, 24000, 16000],
    "MPEG2.5": [11025, 12000, 8000],
}

#: samples per frame by (version_group, layer).
_SPF = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
        ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for an ID3v2 tag at offset 0 (0 if none) —
    synchsafe 28-bit size + 10-byte header (+10 footer if flagged)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be synchsafe")
        size = (size << 7) | b
    return 10 + size + (10 if payload[5] & 0x10 else 0)


def _parse_header(h: int) -> dict[str, Any] | None:
    """Decode a 32-bit big-endian frame header; None if not a valid
    MPEG audio frame sync/header."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (h >> 19) & 0x3
    layer_bits = (h >> 17) & 0x3
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free-format and invalid indexes: not walkable
    version = {0: "MPEG2.5", 2: "MPEG2", 3: "MPEG1"}[version_bits]
    layer = 4 - layer_bits
    group = "1" if version == "MPEG1" else "2"
    bitrate = _BITRATES[(group, layer)][bitrate_idx] * 1000
    rate = _RATES[version][rate_idx]
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    if layer == 1:
        frame_bytes = (12 * bitrate // rate + padding) * 4
    else:
        spf = _SPF[(group, layer)]
        frame_bytes = spf // 8 * bitrate // rate + padding
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "samples_per_frame": _SPF[(group, layer)],
        "frame_bytes": frame_bytes,
    }


def mp3_frame_info(payload: bytes) -> dict[str, Any]:
    """Metadata of an MPEG audio stream: first-frame fields plus a
    structural walk of the whole frame chain —
    ``{version, layer, bitrate, sample_rate, channels, n_frames,
    duration_s, vbr}``. ``bitrate`` is the first frame's; ``vbr`` flags
    whether later frames differ (duration sums per-frame lengths, so
    it is exact for VBR too, up to a truncated final frame which is
    counted if its header is intact)."""
    off = _id3v2_size(payload)
    first = None
    # resync: scan for the first valid header (streams may carry junk
    # before the first frame; the walk from there must stay valid)
    while off + 4 <= len(payload):
        h = int.from_bytes(payload[off : off + 4], "big")
        first = _parse_header(h)
        if first is not None:
            break
        off += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    n_frames = 0
    duration = 0.0
    bitrates = set()
    while off + 4 <= len(payload):
        h = int.from_bytes(payload[off : off + 4], "big")
        info = _parse_header(h)
        if info is None:
            break  # trailing tag (ID3v1 etc.) or truncation
        n_frames += 1
        bitrates.add(info["bitrate"])
        duration += info["samples_per_frame"] / info["sample_rate"]
        off += info["frame_bytes"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "bitrate": first["bitrate"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_s": round(duration, 6),
        "vbr": len(bitrates) > 1,
    }
