"""Incremental ingest (Structured Streaming foreachBatch)."""
