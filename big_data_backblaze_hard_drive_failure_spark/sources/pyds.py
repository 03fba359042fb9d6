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


# --------------------------------------------------------------------
# Writer side of the API: a JSONL directory format with the TWO-PHASE
# COMMIT protocol that makes distributed batch writes exactly-once:
# each task streams its partition to a temp file and returns a
# WriterCommitMessage; only the driver-side commit() renames temps to
# final part files and stamps _SUCCESS — a failed/speculated task's
# temp is invisible, and abort() removes all temps. (Local-fs rename
# here; the protocol is identical on any store with atomic rename.)
# The matching reader lists part files (one InputPartition each) so a
# write -> read round-trip never leaves the Python source path.
# --------------------------------------------------------------------
import dataclasses as _dc  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@_dc.dataclass
class FileCommitMessage(WriterCommitMessage):
    temp_path: str
    n_rows: int


# the JSONL writer predates the shared name; tests construct it
JsonlCommitMessage = FileCommitMessage


class TwoPhaseDirectoryWriter(DataSourceWriter):
    """The two-phase-commit protocol, format-agnostic: subclasses set
    ``suffix`` and implement ``_write_temp(tmp_path, iterator) ->
    n_rows`` (executor side); ``_after_commit(total_rows)`` is an
    optional driver-side hook after all renames land. Keeping ONE copy
    of the protocol means a crash-window fix never has to be made
    twice (this class serves both the JSONL and the Avro OCF sinks)."""

    suffix = ".bin"
    format_name = "two-phase writer"

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{self.format_name} requires a path")
        self.overwrite = overwrite

    def _write_temp(self, tmp: str, iterator) -> int:
        raise NotImplementedError

    def _after_commit(self, total_rows: int) -> None:
        pass

    def write(self, iterator) -> FileCommitMessage:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_temp-{uuid.uuid4().hex}{self.suffix}"
        )
        n = self._write_temp(tmp, iterator)
        return FileCommitMessage(temp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import os
        import uuid

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-"):
                    os.remove(os.path.join(self.path, name))
        # part names carry a commit-scoped uuid: append-mode commits
        # must never collide with (and silently replace) the part
        # files of an earlier commit
        commit_id = uuid.uuid4().hex[:12]
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{commit_id}-{i:05d}{self.suffix}"
            )
            os.replace(m.temp_path, final)
            total += m.n_rows
        self._after_commit(total)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self) -> str:
        # reader infers nothing: the caller supplies .schema(...) on
        # read; this default covers the synthetic-events round-trip
        return (
            "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
        )

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, overwrite)

    def reader(self, schema) -> "JsonlReader":
        return JsonlReader(self.options, schema)


class JsonlWriter(TwoPhaseDirectoryWriter):
    suffix = ".jsonl"
    format_name = "jsonl_dir"

    def _write_temp(self, tmp: str, iterator) -> int:
        import json

        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return n

    def _after_commit(self, total_rows: int) -> None:
        import json
        import os

        # _SUCCESS reflects the DIRECTORY state (all live parts), not
        # just this commit, so appends keep it truthful
        n_parts = sum(
            1 for n in os.listdir(self.path) if n.startswith("part-")
        )
        prev = 0
        success = os.path.join(self.path, "_SUCCESS")
        if not self.overwrite and os.path.exists(success):
            with open(success) as f:
                prev = json.load(f).get("n_rows", 0)
        with open(success, "w") as f:
            json.dump({"n_rows": prev + total_rows, "n_files": n_parts}, f)


class JsonlReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        import os

        names = sorted(
            n for n in os.listdir(self.path) if n.startswith("part-")
        )
        return [InputPartition(os.path.join(self.path, n)) for n in names]

    def read(self, partition: InputPartition):
        import json

        with open(partition.value) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(rec.get(name) for name in self.fields)


def register_jsonl_source(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
