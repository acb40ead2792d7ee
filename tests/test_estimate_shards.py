"""Open-shard counting (F6/A5) against a fake paginating describe_stream."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.functions.estimate import count_open_shards


def _shard(shard_id: str, closed: bool = False) -> dict:
    rng: dict = {"StartingSequenceNumber": "100"}
    if closed:
        rng["EndingSequenceNumber"] = "200"
    return {"ShardId": shard_id, "SequenceNumberRange": rng}


def test_counts_only_open_shards():
    def describe(StreamName, **kwargs):
        assert StreamName == "target"
        return {
            "StreamDescription": {
                "Shards": [
                    _shard("s1"),
                    _shard("s2", closed=True),
                    _shard("s3"),
                ],
                "HasMoreShards": False,
            }
        }

    assert count_open_shards(describe, "target") == 2


def test_paginates_with_exclusive_start():
    pages = {
        None: (["s1", "s2"], True),
        "s2": (["s3"], False),
    }
    calls = []

    def describe(StreamName, ExclusiveStartShardId=None):
        calls.append(ExclusiveStartShardId)
        ids, more = pages[ExclusiveStartShardId]
        return {
            "StreamDescription": {
                "Shards": [_shard(i) for i in ids],
                "HasMoreShards": more,
            }
        }

    assert count_open_shards(describe, "t") == 3
    assert calls == [None, "s2"]


def test_estimate_requires_shard_source(spark, tmp_path):
    from datetime import datetime

    from kinesis_vcr_spark.functions.estimate import estimate_replay_time

    with pytest.raises(ValueError, match="open_shards"):
        estimate_replay_time(
            spark, str(tmp_path), datetime(2024, 1, 1), None
        )
