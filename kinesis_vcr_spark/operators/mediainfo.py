"""Unified media-container metadata — ONE sniff-and-dispatch surface
over every in-repo container/metadata tier, and its Arrow-batched
DataFrame operator.

A crawl pipeline's first question about a binary payload is not "what
are the pixels" but "what IS this, how long, how big" — answerable
from container arithmetic alone for every format this repo walks:

| magic              | tier                                        |
|--------------------|---------------------------------------------|
| RIFF/WAVE          | fmt-chunk parse (rate/channels/exact frames)|
| RIFF/AVI           | operators/avi.py header+chunk walk          |
| fLaC               | operators/flac.py STREAMINFO                |
| OggS               | operators/ogg.py page walk (CRC-validated)  |
| ADTS / MP4 / M4A   | operators/aac.py frame-chain / box walk     |
| MP4 w/ vide track  | operators/mp4video.py box walk              |
| EBML (WebM/MKV)    | operators/webm.py element walk              |
| ID3 / MPEG sync    | operators/mp3.py frame-chain walk           |

:func:`container_info` returns ONE normalized row shape regardless of
format: ``{container, codec, duration_s, width, height, channels,
sample_rate, n_frames}`` (NULLs where a format has no such axis).
:func:`container_stats` lifts it over a MEDIA_SCHEMA DataFrame as one
narrow ``mapInPandas`` stage (the extract_media_features idiom):
malformed payloads yield a NULL-metrics row with ``container =
'error'`` instead of killing the task — crawl posture, rows stay
filterable.

No reference counterpart; additive engine layer.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CONTAINER_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("container", StringType(), True),
        StructField("codec", StringType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)

_NULLS = {
    "codec": None,
    "duration_s": None,
    "width": None,
    "height": None,
    "channels": None,
    "sample_rate": None,
    "n_frames": None,
}


def _wav_info(payload: bytes) -> dict[str, Any]:
    """fmt/data chunk walk — header-only (no sample decode): exact
    frame count = data bytes / block_align."""
    pos = 12
    n = len(payload)
    fmt = None
    data_len = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and clen >= 16:
            tag, channels, rate, _bps, block_align = struct.unpack_from(
                "<HHIIH", payload, body
            )
            fmt = (tag, channels, rate, block_align)
        elif cid == b"data":
            data_len = min(clen, n - body)
        pos = body + clen + (clen & 1)
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    tag, channels, rate, block_align = fmt
    frames = (
        data_len // block_align
        if data_len is not None and block_align
        else None
    )
    return {
        "container": "wav",
        "codec": {1: "pcm", 2: "ms_adpcm", 3: "float", 6: "alaw",
                  7: "mulaw", 17: "ima_adpcm"}.get(tag, f"tag_{tag}"),
        "duration_s": (
            round(frames / rate, 3) if frames is not None and rate else None
        ),
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": rate,
        "n_frames": frames,
    }


def container_info(payload: bytes) -> dict[str, Any]:
    """Sniff the container by magic and return the normalized metadata
    row (see module docstring). Unknown magics raise ValueError —
    callers choosing the crawl posture use :func:`container_stats`."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _wav_info(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from kinesis_vcr_spark.operators.avi import avi_info  # noqa: PLC0415

        meta = avi_info(payload)  # header-only: no frame materialization
        return dict(
            _NULLS,
            container="avi",
            codec=meta["codec"],
            duration_s=(
                round(meta["n_frames"] / meta["fps"], 3)
                if meta["fps"] else None
            ),
            width=meta["width"],
            height=meta["height"],
            n_frames=meta["n_frames"],
        )
    if payload[:4] == b"fLaC":
        from kinesis_vcr_spark.operators.flac import flac_info  # noqa: PLC0415

        fi = flac_info(payload)
        return dict(
            _NULLS,
            container="flac",
            codec="flac",
            duration_s=fi["duration_s"],
            channels=fi["channels"],
            sample_rate=fi["sample_rate"],
            n_frames=fi["total_samples"],
        )
    if payload[:4] == b"OggS":
        from kinesis_vcr_spark.operators.ogg import ogg_info  # noqa: PLC0415

        oi = ogg_info(payload)
        return dict(
            _NULLS,
            container="ogg",
            codec=oi["codec"],
            duration_s=oi["duration_s"],
            channels=oi["channels"] or None,
            sample_rate=oi["sample_rate"] or None,
            n_frames=oi["total_samples"],
        )
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        from kinesis_vcr_spark.operators.webm import webm_info  # noqa: PLC0415

        wi = webm_info(payload)
        vid = next((t for t in wi["tracks"] if t["type"] == "video"), None)
        aud = next((t for t in wi["tracks"] if t["type"] == "audio"), None)
        lead = vid or aud
        return dict(
            _NULLS,
            container="webm",
            codec=lead["codec_id"] if lead else None,
            duration_s=wi["duration_s"],
            width=vid["width"] if vid else None,
            height=vid["height"] if vid else None,
            channels=aud["channels"] if aud else None,
            sample_rate=(
                int(aud["sample_rate"])
                if aud and aud["sample_rate"] else None
            ),
            n_frames=lead["n_frames"] if lead else None,
        )
    from kinesis_vcr_spark.operators.aac import (  # noqa: PLC0415
        is_adts,
        is_mp4,
        m4a_info,
    )

    if is_mp4(payload):
        from kinesis_vcr_spark.operators.mp4video import (  # noqa: PLC0415
            mp4_video_info,
        )

        try:
            vi = mp4_video_info(payload)
            return dict(
                _NULLS,
                container="mp4",
                codec=vi["codec"],
                duration_s=vi["duration_s"],
                width=vi["width"],
                height=vi["height"],
                n_frames=vi["n_frames"],
            )
        except ValueError:
            ai = m4a_info(payload)  # audio-only .m4a
            return dict(
                _NULLS,
                container="mp4",
                codec=ai["codec"],
                duration_s=ai["duration_s"],
                channels=ai["channels"],
                sample_rate=ai["sample_rate"],
            )
    if is_adts(payload):
        from kinesis_vcr_spark.operators.aac import adts_info  # noqa: PLC0415

        ai = adts_info(payload)
        return dict(
            _NULLS,
            container="adts",
            codec=ai["codec"],
            duration_s=ai["duration_s"],
            channels=ai["channels"],
            sample_rate=ai["sample_rate"],
            n_frames=ai["n_frames"],
        )
    if payload[:3] == b"ID3" or (
        len(payload) > 1
        and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
    ):
        from kinesis_vcr_spark.operators.mp3 import (  # noqa: PLC0415
            mp3_frame_info,
        )

        mi = mp3_frame_info(payload)
        return dict(
            _NULLS,
            container="mpeg-audio",
            codec=f"{mi['version']} layer {mi['layer']}",
            duration_s=mi["duration_s"],
            channels=mi["channels"],
            sample_rate=mi["sample_rate"],
            n_frames=mi["n_frames"],
        )
    raise ValueError("unrecognized container magic")


def container_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched container metadata over a MEDIA_SCHEMA DataFrame
    — one narrow ``mapInPandas`` stage, no shuffle. Malformed or
    unrecognized payloads produce ``container='error'`` rows with NULL
    metrics (the MALFORMED_ERRORS quarantine contract shared with
    extract_media_features)."""
    import pandas as pd

    from kinesis_vcr_spark.operators.multimodal import (  # noqa: PLC0415
        MALFORMED_ERRORS,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                row: dict[str, Any] = dict(
                    _NULLS, media_id=int(mid), payload_bytes=len(raw),
                    container=None,
                )
                try:
                    row.update(container_info(raw))
                except MALFORMED_ERRORS:
                    row["container"] = "error"
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in CONTAINER_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=CONTAINER_SCHEMA
    )


__all__ = ["CONTAINER_SCHEMA", "container_info", "container_stats"]
