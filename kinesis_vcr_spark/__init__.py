"""kinesis_vcr_spark — a PySpark-native engine with the query and
data-processing capabilities of scopely/kinesis-vcr, rebuilt from scratch
on idiomatic Spark (DataFrame / SQL / Structured Streaming).

The reference (``/root/reference``, see SURVEY.md) is a Kinesis stream
record / replay / estimate tool. This package re-expresses its semantics
Spark-first:

- **record** (streaming ingest → date-partitioned base64 archive):
  :mod:`kinesis_vcr_spark.streaming.record`
- **play** (batch replay with API-limit batching + retry):
  :mod:`kinesis_vcr_spark.play`, :mod:`kinesis_vcr_spark.operators.batching`
- **estimate** (metadata-only aggregate over the archive):
  :mod:`kinesis_vcr_spark.functions.estimate`

Beyond the reference surface it ships the large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) under :mod:`kinesis_vcr_spark.operators`, all designed to stay in
DataFrame-plan-land at 100 TB scale (no collect() in any operator path,
broadcast for small sides, partial aggregation, pruned scans).
"""

from kinesis_vcr_spark.config import VcrConfig
from kinesis_vcr_spark.session import get_spark
from kinesis_vcr_spark.timeparse import (
    default_end,
    humanize_minutes,
    parse_datetime,
    validate_range,
)

__all__ = [
    "VcrConfig",
    "get_spark",
    "parse_datetime",
    "default_end",
    "validate_range",
    "humanize_minutes",
]

__version__ = "0.1.0"
