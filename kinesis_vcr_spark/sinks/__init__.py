"""Sinks: Kinesis putRecords writer (boto3-gated) and test collectors."""
