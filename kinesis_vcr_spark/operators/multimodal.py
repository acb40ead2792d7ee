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
