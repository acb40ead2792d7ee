"""Multimodal columns — opaque binary payloads with typed metadata,
and Arrow-batched feature extraction.

Media (image/audio/video) rides through the engine the same way the
reference treats Kinesis payloads: an opaque ``binary`` column plus
typed metadata (the reference is "completely agnostic to the format of
records on the wire", README.md "Format") — so ingest/shuffle/dedup all
work on media without decoding.

Decoding is the only step that needs Python libraries (PIL/ffmpeg are
NOT in this environment): the decoders below are STUBS behind a
registry; ``FakeDecoder`` is a deterministic stand-in that makes the
Spark-side plumbing — schema, ``mapInPandas`` batching, Arrow transfer,
partition-preserving shape — real and testable.

Scale posture: feature extraction is ``mapInPandas`` (one Arrow batch at
a time, bounded memory via ``maxRecordsPerBatch``), a NARROW transform:
no shuffle, parallel by input split; binary payloads never pass through
a Python row loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("width", LongType(), True),  # frames for audio/video
        StructField("height", LongType(), True),
        StructField("mean_value", DoubleType(), True),
    ]
)

Decoder = Callable[[str, bytes], dict[str, Any]]


def decode_image(payload: bytes) -> dict[str, Any]:
    """Real image decode — requires PIL, not present in this container.

    Cited behaviorally from the brief (decode / resize / frame-sample);
    wire a real implementation by registering it as the decoder."""
    raise NotImplementedError(
        "image decoding requires PIL/pillow; register a real Decoder or "
        "use FakeDecoder for pipeline testing"
    )


def decode_audio(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "audio decoding requires soundfile/ffmpeg; register a real "
        "Decoder or use FakeDecoder for pipeline testing"
    )


def fake_decode(kind: str, payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in decoder: derives plausible dimensions and
    a mean-byte 'pixel value' from the raw bytes — exercises the full
    Arrow/mapInPandas path with checkable outputs."""
    n = len(payload)
    if kind == "image":
        width = max(int(n**0.5), 1)
        height = max(n // width, 1)
    else:  # audio/video: frame count at a fixed 32-byte frame
        width, height = max(n // 32, 1), 1
    mean = float(sum(payload) / n) if n else 0.0
    return {"width": width, "height": height, "mean_value": mean}


def extract_media_features(
    media: DataFrame, decoder: Decoder = fake_decode
) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    ``mapInPandas``: each Arrow batch is decoded vectorized-per-batch in
    one Python call (not per-row pickling); output schema is fixed so
    downstream stays fully relational.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(k, bytes(p) if p is not None else b"")
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_value": [f["mean_value"] for f in feats],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("frame_bytes", LongType(), False),
    ]
)

FRAME_SIZE = 32  # fake codec: fixed 32-byte frames


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling — one output row per kept frame (1→N fan-out
    inside ``mapInPandas``; Arrow batches in, exploded frame rows out,
    still a narrow transform: no shuffle, parallel by input split).

    The stub codec treats the payload as fixed-size 32-byte frames and
    keeps every ``every_n``-th (a real video codec slots in behind the
    same iterator without touching the Spark plan). The tail frame is
    kept short, like a real final partial GOP."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def explode_frames(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                n_frames = max(
                    (len(p) + FRAME_SIZE - 1) // FRAME_SIZE, 1
                )
                for j in range(0, n_frames, every_n):
                    fr = p[j * FRAME_SIZE : (j + 1) * FRAME_SIZE]
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(fr)
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_bytes": sizes,
                }
            )

    return media.mapInPandas(explode_frames, FRAME_SCHEMA)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: tiles/truncates the source bytes
    to exactly ``width*height``. A real implementation (PIL) replaces
    this function only — the Spark plumbing is identical."""
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Batch resize: MEDIA_SCHEMA in → MEDIA_SCHEMA out (payload
    replaced, ``meta['resized']`` stamped) — composable with every other
    media operator since the schema round-trips."""

    def do_resize(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                resizer(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            pdf["meta"] = [
                {**(m if m is not None else {}), "resized": f"{width}x{height}"}
                for m in pdf["meta"]
            ]
            yield pdf

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    container has no real media fixtures; payload layout is what's
    under test, not the codec)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )
