"""Structured-Streaming ingestion into engine tables.

The reference is batch-only (SURVEY §2.11: cron loop,
ops/view_refresh_scheduler.py:219-224); this module is the Spark-native
upgrade path: a file-drop directory tailed by ``readStream`` with
exactly-once appends into our table format via epoch-guarded commits.
"""

from .ingest import stream_append, stream_dedup_ingest, stream_upserts

__all__ = ["stream_append", "stream_dedup_ingest", "stream_upserts"]
