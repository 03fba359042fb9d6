"""Custom PySpark-native data source (Spark 4 Python Data Source API).

A deterministic synthetic-events generator registered as
``spark.read.format("synthetic_events")`` — the engine's test-data /
load-generation source. Demonstrates the full custom-source contract:

  * schema declaration (matches the catalog's events shape)
  * partition planning: ``n_partitions`` InputPartitions, each read
    independently by an executor-side Python worker — the source
    scales horizontally like any file scan
  * FILTER PUSHDOWN into Python: ``pushFilters`` consumes
    ``EqualTo(user_id)`` / ``GreaterThan(user_id)`` so the generator
    skips non-matching rows at the source instead of materializing
    them for Spark to discard — the same contract parquet scans get
    from Catalyst, now crossing the Python boundary (Spark 4.1)

Everything derives from ``(seed, event_id)`` arithmetic, so any slice
is reproducible on any cluster with no I/O — useful for scale testing
the engine's operators at arbitrary row counts.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "error")
_USER_MOD = 97
_MIX = 2654435761  # Knuth multiplicative-hash constant


def _row(event_id: int):
    """Pure function event_id -> row; the whole dataset is this map."""
    user_id = (event_id * _MIX) % _USER_MOD
    etype = _EVENT_TYPES[(event_id * 7) % len(_EVENT_TYPES)]
    value = float((event_id * 31) % 10_000) / 100.0
    return (event_id, user_id, etype, value)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.user_eq: int | None = None
        self.user_gt: int | None = None

    def pushFilters(self, filters: list[Filter]):
        """Consume user_id equality/greater-than; everything else goes
        back to Spark (returned = NOT handled here)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("user_id",):
                self.user_eq = int(f.value)
            elif isinstance(f, GreaterThan) and f.attribute == ("user_id",):
                self.user_gt = int(f.value)
            else:
                yield f

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        start = partition.value * self.rows_per_partition
        for event_id in range(start, start + self.rows_per_partition):
            row = _row(event_id)
            if self.user_eq is not None and row[1] != self.user_eq:
                continue
            if self.user_gt is not None and row[1] <= self.user_gt:
                continue
            yield row


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# --------------------------------------------------------------------
# Streaming variant: the same deterministic generator as an unbounded
# micro-batch source (SimpleDataSourceStreamReader). Offsets are plain
# dicts checkpointed by Spark; readBetweenOffsets makes every batch
# REPLAYABLE — after a crash, re-reading [start, end) yields byte-
# identical rows, which is the exactly-once contract a custom source
# must honor. Pure arithmetic, so replay is trivially consistent.
# --------------------------------------------------------------------
class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        first = int(start["next"])
        end = {"next": first + self.batch_rows}
        return (
            iter([_row(i) for i in range(first, first + self.batch_rows)]),
            end,
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])
