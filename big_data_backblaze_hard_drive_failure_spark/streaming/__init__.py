"""Structured Streaming twin of the batch pipeline (SURVEY.md §2.10).

The reference is daily batch; its 'deployment' is batch inference on a
future slice (/root/reference/scripts/06_deployment_code.py:7-15).
This module shows the same alerting semantics as a continuous
pipeline: ``readStream`` over the identical schema, watermarked
event-time windows for the daily alert rollup, and the same scorer
expressions (they are plain Columns — batch/stream agnostic).

Not oracle-checkable (the driver's DuckDB harness is batch), so this
surface is covered by tests/test_streaming.py: a bounded
``availableNow`` run into a memory sink must reproduce the batch
answer exactly.
"""

from .pipeline import daily_alert_stream, read_events_stream, score_stream
from .sinks import foreach_batch_parquet_dedup, foreach_batch_snapshot

__all__ = [
    "read_events_stream",
    "score_stream",
    "daily_alert_stream",
    "foreach_batch_parquet_dedup",
    "foreach_batch_snapshot",
]
