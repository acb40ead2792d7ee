"""MP4/MOV VIDEO track metadata tier — the video sibling of the
audio box walk in :mod:`~kinesis_vcr_spark.operators.aac`.

Training corpora ship .mp4 clips constantly; crawl stats need
dimensions / codec / frame count / duration WITHOUT an H.264 decoder
(which stays the documented ffmpeg slot, like the AAC filterbank).
Everything this tier reports is exact container arithmetic:

- ``tkhd`` carries the track's presentation width/height (16.16
  fixed-point; ISO 14496-12 §8.3.2);
- ``stsd``'s first VisualSampleEntry carries the CODED width/height
  and the codec fourcc (``avc1``/``hvc1``/``mp4v``/``vp09``/
  ``av01``); for ``avc1`` the ``avcC`` configuration box yields the
  AVC profile/level WITHOUT parsing any NAL (ISO 14496-15 §5.3.3);
- ``mdhd`` timescale/duration give exact duration;
- ``stsz``'s sample_count is the exact frame count, so ``fps`` is
  derived, not guessed.

Reuses the ISO-BMFF box machinery from ``operators/aac.py`` (one
box-walk implementation per repo). Malformed structures raise
ValueError — the codec contract's quarantine path.

No reference counterpart; additive engine layer.
"""

from __future__ import annotations

from typing import Any

from kinesis_vcr_spark.operators.aac import _boxes, _find_box, is_mp4

_AVC_PROFILES = {
    66: "baseline",
    77: "main",
    88: "extended",
    100: "high",
    110: "high10",
    122: "high422",
    244: "high444",
}


def _mdhd_duration(payload: bytes, mdhd: tuple[int, int]) -> tuple[int, int]:
    mb = mdhd[0]
    version = payload[mb]
    if version == 1:
        timescale = int.from_bytes(payload[mb + 20 : mb + 24], "big")
        duration = int.from_bytes(payload[mb + 24 : mb + 32], "big")
    else:
        timescale = int.from_bytes(payload[mb + 12 : mb + 16], "big")
        duration = int.from_bytes(payload[mb + 16 : mb + 20], "big")
    if timescale == 0:
        raise ValueError("mdhd timescale is zero")
    return timescale, duration


def mp4_video_info(payload: bytes) -> dict[str, Any]:
    """Metadata of an MP4/MOV container's FIRST video track:
    ``{codec, width, height, track_width, track_height, n_frames,
    duration_s, fps, timescale, avc_profile, avc_level}``. Files with
    no ``vide`` track raise ValueError (audio-only .m4a goes to
    ``m4a_info``)."""
    if not is_mp4(payload):
        raise ValueError("not an MP4/MOV file (no ftyp box)")
    moov = _find_box(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for t, tb, te in _boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find_box(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find_box(payload, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak has no mdhd box")
        timescale, duration = _mdhd_duration(payload, mdhd)

        # tkhd presentation size (16.16 fixed): v0 width at body+76,
        # v1 at +88 (creation/modification/duration widen 4→8 bytes)
        track_w = track_h = None
        tkhd = _find_box(payload, tb, te, b"tkhd")
        if tkhd is not None:
            kb = tkhd[0]
            off = kb + (88 if payload[kb] == 1 else 76)
            if off + 8 <= tkhd[1]:
                track_w = int.from_bytes(payload[off : off + 4], "big") >> 16
                track_h = int.from_bytes(payload[off + 4 : off + 8], "big") >> 16

        minf = _find_box(payload, *mdia, b"minf")
        stbl = minf and _find_box(payload, *minf, b"stbl")
        stsd = stbl and _find_box(payload, *stbl, b"stsd")
        if not stsd:
            raise ValueError("video trak has no stsd box")
        entries = list(_boxes(payload, stsd[0] + 8, stsd[1]))
        if not entries:
            raise ValueError("stsd has no sample entries")
        fourcc, eb, ee = entries[0]
        # VisualSampleEntry: 6 reserved + 2 data_ref_index +
        # 2 pre_defined + 2 reserved + 12 pre_defined, then
        # width(2) height(2) (ISO 14496-12 §12.1.3)
        width = int.from_bytes(payload[eb + 24 : eb + 26], "big")
        height = int.from_bytes(payload[eb + 26 : eb + 28], "big")

        n_frames = None
        stsz = _find_box(payload, *stbl, b"stsz")
        if stsz is not None:
            n_frames = int.from_bytes(
                payload[stsz[0] + 8 : stsz[0] + 12], "big"
            )

        duration_s = round(duration / timescale, 6)
        out: dict[str, Any] = {
            "codec": fourcc.decode("latin-1").strip(),
            "width": width,
            "height": height,
            "track_width": track_w,
            "track_height": track_h,
            "n_frames": n_frames,
            "duration_s": duration_s,
            "fps": (
                round(n_frames / duration_s, 3)
                if n_frames and duration_s
                else None
            ),
            "timescale": timescale,
            "avc_profile": None,
            "avc_level": None,
        }
        if fourcc == b"avc1":
            # the VisualSampleEntry body is 78 bytes; config boxes follow
            avcc = _find_box(payload, eb + 78, ee, b"avcC")
            if avcc is not None and avcc[1] - avcc[0] >= 4:
                ab = avcc[0]
                profile_idc = payload[ab + 1]
                out["avc_profile"] = _AVC_PROFILES.get(
                    profile_idc, f"idc_{profile_idc}"
                )
                out["avc_level"] = round(payload[ab + 3] / 10.0, 1)
        return out
    raise ValueError("MP4 has no video (vide) track")


__all__ = ["mp4_video_info"]
