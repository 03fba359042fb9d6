"""Streaming deduplication with bounded state.

Plain ``dropDuplicates`` on a stream keeps EVERY key ever seen —
unbounded state, the classic slow-death of a long-running dedup job.
``dropDuplicatesWithinWatermark`` bounds state by the watermark: a
key's fingerprint is held only until the watermark passes its event
time plus the allowance, which is exactly the contract a 100 TB/day
ingest dedup needs (duplicates arrive close together — retries,
at-least-once sources — so a bounded horizon catches them all while
state stays O(keys-per-window), not O(keys-ever)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    allowance: str = "1 day",
) -> DataFrame:
    """Drop duplicate ``keys`` rows arriving within the watermark
    allowance of each other; state for a key expires once the
    watermark passes it."""
    return stream.withWatermark(event_time_col, allowance).dropDuplicatesWithinWatermark(
        list(keys)
    )
