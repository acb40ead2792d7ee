"""Structured Streaming layer: the record (ingest→archive) pipeline."""
