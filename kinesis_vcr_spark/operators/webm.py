"""WebM / Matroska (EBML) container tier — completes the web-media
triad next to :mod:`~kinesis_vcr_spark.operators.ogg` (Ogg) and
:mod:`~kinesis_vcr_spark.operators.mp4video` (ISO-BMFF).

Crawl corpora ship ``.webm`` constantly (it is the HTML5 default);
the container alone yields everything crawl stats need without a
VP8/VP9/AV1/Opus payload decoder:

- EBML element walk (RFC 8794 variable-length IDs and sizes,
  unknown-size segments handled the way streamed WebM writes them);
- Segment→Info: TimecodeScale (default 1 000 000 ns) and Duration →
  exact presentation duration;
- Segment→Tracks: per-track TrackType / CodecID (``V_VP8``,
  ``V_VP9``, ``A_OPUS``, ``A_VORBIS``, …), video PixelWidth/Height,
  audio SamplingFrequency/Channels;
- Segment→Cluster walk: SimpleBlock/BlockGroup counting with EBML
  lacing expansion (Xiph / fixed / EBML lace counts, RFC 9559 §10)
  gives the EXACT frame count per track — the ADTS-frame-chain
  honesty applied to video.

Payload decode stays the documented ffmpeg slot (VP8 KEY FRAMES can
ride :mod:`~kinesis_vcr_spark.operators.vp8` when extracted, but
inter-frame reconstruction is out of scope). Malformed structures
raise ValueError — the codec contract's quarantine path.

Pure Python/stdlib; no reference counterpart; additive layer.
"""

from __future__ import annotations

import struct
from typing import Any

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_CLUSTER = 0x1F43B336
_TRACK_ENTRY = 0xAE
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}


def _read_id(payload: bytes, pos: int) -> tuple[int, int]:
    """EBML ID: 1-4 bytes, marker bit KEPT (RFC 8794 §5)."""
    if pos >= len(payload):
        raise ValueError("EBML: truncated element id")
    first = payload[pos]
    for n in range(1, 5):
        if first & (0x80 >> (n - 1)):
            if pos + n > len(payload):
                raise ValueError("EBML: truncated element id")
            return int.from_bytes(payload[pos : pos + n], "big"), pos + n
    raise ValueError(f"EBML: invalid id lead byte {first:#x}")


def _read_size(payload: bytes, pos: int) -> tuple[int | None, int]:
    """EBML size: 1-8 bytes, marker stripped; all-VINT_DATA-ones means
    UNKNOWN size (None) — streamed segments use it."""
    if pos >= len(payload):
        raise ValueError("EBML: truncated element size")
    first = payload[pos]
    for n in range(1, 9):
        if first & (0x80 >> (n - 1)):
            if pos + n > len(payload):
                raise ValueError("EBML: truncated element size")
            raw = int.from_bytes(payload[pos : pos + n], "big")
            value = raw & ~(1 << (7 * n))
            if value == (1 << (7 * n)) - 1:
                return None, pos + n
            return value, pos + n
    raise ValueError(f"EBML: invalid size lead byte {first:#x}")


def _elements(payload: bytes, start: int, end: int):
    """Yield ``(id, body_start, body_end)``. An unknown-size SEGMENT
    extends to the enclosing end (the streamed-file shape every muxer
    writes); unknown size on any other element — e.g. live-streaming
    clusters, whose true end is only findable by child-validity
    scanning (RFC 9559 §6.2) — raises loudly rather than risking a
    silent frame miscount."""
    pos = start
    while pos < end:
        eid, p = _read_id(payload, pos)
        size, p = _read_size(payload, p)
        if size is None and eid != _SEGMENT:
            raise ValueError(
                f"EBML: unknown-size element {eid:#x} unsupported "
                "(live-stream shape; only the Segment may be unsized)"
            )
        body_end = end if size is None else p + size
        if body_end > end:
            raise ValueError(f"EBML: element {eid:#x} overruns its container")
        yield eid, p, body_end
        pos = body_end


def _uint(payload: bytes, s: int, e: int) -> int:
    return int.from_bytes(payload[s:e], "big")


def _float(payload: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", payload[s:e])[0]
    if n == 8:
        return struct.unpack(">d", payload[s:e])[0]
    raise ValueError(f"EBML: float of width {n}")


def is_webm(payload: bytes) -> bool:
    return payload[:4] == b"\x1a\x45\xdf\xa3"


def _count_block_frames(payload: bytes, s: int, e: int) -> tuple[int, int]:
    """(track_number, n_frames) for one (Simple)Block — lacing-aware:
    no lacing = 1 frame, else the lace-count byte says how many
    (RFC 9559 §10.2; frame count = laces + 1, independent of lace
    size encoding)."""
    track, p = _read_size(payload, s)  # track number is a plain vint
    if track is None:
        raise ValueError("EBML: block with unknown track number")
    if p + 3 > e:
        raise ValueError("EBML: truncated block header")
    flags = payload[p + 2]
    lacing = (flags >> 1) & 0x03
    if lacing == 0:
        return track, 1
    if p + 4 > e:
        raise ValueError("EBML: truncated lace count")
    return track, payload[p + 3] + 1


def webm_info(payload: bytes) -> dict[str, Any]:
    """Container metadata: ``{tracks: [{number, type, codec_id, width,
    height, sample_rate, channels, n_frames}, ...], duration_s,
    timecode_scale_ns, n_clusters}``. ``n_frames`` is the exact
    lacing-expanded block-frame count per track from the cluster
    walk."""
    if not is_webm(payload):
        raise ValueError("not an EBML/WebM stream (no EBML header)")
    top = _elements(payload, 0, len(payload))
    eid, s, e = next(top)
    # (is_webm checked the magic; the first element IS the EBML header)
    segment = None
    for eid, s, e in top:
        if eid == _SEGMENT:
            segment = (s, e)
            break
    if segment is None:
        raise ValueError("EBML: no Segment element")

    timecode_scale = 1_000_000
    duration_ticks: float | None = None
    tracks: list[dict[str, Any]] = []
    frames: dict[int, int] = {}
    n_clusters = 0

    for eid, s, e in _elements(payload, *segment):
        if eid == _INFO:
            for cid, cs, ce in _elements(payload, s, e):
                if cid == _TIMECODE_SCALE:
                    timecode_scale = _uint(payload, cs, ce)
                elif cid == _DURATION:
                    duration_ticks = _float(payload, cs, ce)
        elif eid == _TRACKS:
            for cid, cs, ce in _elements(payload, s, e):
                if cid != _TRACK_ENTRY:
                    continue
                t: dict[str, Any] = {
                    "number": None,
                    "type": None,
                    "codec_id": None,
                    "width": None,
                    "height": None,
                    "sample_rate": None,
                    "channels": None,
                }
                for fid, fs, fe in _elements(payload, cs, ce):
                    if fid == _TRACK_NUMBER:
                        t["number"] = _uint(payload, fs, fe)
                    elif fid == _TRACK_TYPE:
                        v = _uint(payload, fs, fe)
                        t["type"] = _TRACK_TYPES.get(v, f"type_{v}")
                    elif fid == _CODEC_ID:
                        t["codec_id"] = payload[fs:fe].decode(
                            "ascii", "replace"
                        )
                    elif fid == _VIDEO:
                        for vid, vs, ve in _elements(payload, fs, fe):
                            if vid == _PIXEL_WIDTH:
                                t["width"] = _uint(payload, vs, ve)
                            elif vid == _PIXEL_HEIGHT:
                                t["height"] = _uint(payload, vs, ve)
                    elif fid == _AUDIO:
                        for aid, as_, ae in _elements(payload, fs, fe):
                            if aid == _SAMPLING_FREQ:
                                t["sample_rate"] = _float(payload, as_, ae)
                            elif aid == _CHANNELS:
                                t["channels"] = _uint(payload, as_, ae)
                tracks.append(t)
        elif eid == _CLUSTER:
            n_clusters += 1
            for cid, cs, ce in _elements(payload, s, e):
                if cid == _SIMPLE_BLOCK:
                    track, n = _count_block_frames(payload, cs, ce)
                    frames[track] = frames.get(track, 0) + n
                elif cid == _BLOCK_GROUP:
                    for gid, gs, ge in _elements(payload, cs, ce):
                        if gid == _BLOCK:
                            track, n = _count_block_frames(payload, gs, ge)
                            frames[track] = frames.get(track, 0) + n

    if not tracks:
        raise ValueError("EBML: Segment has no Tracks element")
    for t in tracks:
        t["n_frames"] = frames.get(t["number"], 0)
    duration_s = (
        round(duration_ticks * timecode_scale / 1e9, 6)
        if duration_ticks is not None
        else None
    )
    return {
        "tracks": tracks,
        "duration_s": duration_s,
        "timecode_scale_ns": timecode_scale,
        "n_clusters": n_clusters,
    }


# ---------------------------------------------------------------- writer

def _vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(value: int) -> bytes:
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def ebml_element(eid: int, body: bytes) -> bytes:
    """Spec-rule EBML writer (the build_ogg pattern — the round-trip
    oracle for the walk above)."""
    return _vint_id(eid) + _vint_size(len(body)) + body


def ebml_uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return ebml_element(eid, value.to_bytes(n, "big"))


def ebml_float(eid: int, value: float) -> bytes:
    return ebml_element(eid, struct.pack(">d", value))


__all__ = [
    "ebml_element",
    "ebml_float",
    "ebml_uint",
    "is_webm",
    "webm_info",
]
