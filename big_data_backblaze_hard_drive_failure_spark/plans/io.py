"""I/O round-trip queries (reference S1/S3/S7/T3 exercised end-to-end).

Each query materializes an intermediate to local scratch storage
(parquet or CSV), re-reads it, and aggregates — so the write path,
the writer tuning, and the explicit-schema CSV reader are all inside
the oracle-checked surface. The oracle runs the same computation
directly over the source table: a correct round-trip is value-neutral.

Scratch lives under the repo (driver contract forbids writing
elsewhere); each query uses its own subdirectory with overwrite mode
so reruns are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load
from ..sources.sinks import read_csv, write_csv, write_parquet
from . import query

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_scratch",
)


_SCRATCH_SWEPT = False


def scratch_dir(name: str) -> str:
    """Per-PROCESS scratch path for write-then-read-back queries.

    The pid component isolates concurrent harnesses (pytest + a bench
    or parity run in another process): every roundtrip query writes
    eagerly inside its build and reads the path lazily at execution,
    so two processes sharing one path can clobber each other's files
    mid-read (observed as FileNotFoundException on a part file).
    Within a process the path is stable, so repeat builds still
    overwrite in place instead of accumulating. Dead processes'
    ``run_<pid>`` dirs are swept once per process (pid liveness via
    kill -0), so scratch stays bounded across sessions."""
    global _SCRATCH_SWEPT
    base = os.path.join(_SCRATCH, f"run_{os.getpid()}")
    path = os.path.join(base, name)
    os.makedirs(base, exist_ok=True)
    if not _SCRATCH_SWEPT:
        _SCRATCH_SWEPT = True
        import shutil

        for entry in os.listdir(_SCRATCH):
            if not entry.startswith("run_") or entry == f"run_{os.getpid()}":
                continue
            try:
                pid = int(entry[4:])
                os.kill(pid, 0)  # raises if the owner is gone
            except (ValueError, ProcessLookupError):
                shutil.rmtree(
                    os.path.join(_SCRATCH, entry), ignore_errors=True
                )
            except PermissionError:
                pass  # live process owned by someone else: leave it
    return path


# --------------------------------------------------------------------
# S3/S4/T3: parquet write (tuned codec/row-groups via session conf,
# coalesce pre-write) -> re-scan -> profile. Reference stage
# materialization (01:26-28, 02:161-174).
# --------------------------------------------------------------------
@query(
    "io_parquet_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY event_type
    """,
)
def io_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("parquet_roundtrip")
    staged = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    write_parquet(staged, path, n_files=4)
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )


# --------------------------------------------------------------------
# S7 + S1: CSV write -> explicit-schema CSV read (no inferSchema
# pre-pass) -> aggregate. Reference 05_SHAP:164-167 / 01:17-22.
# --------------------------------------------------------------------
_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


@query(
    "io_csv_roundtrip",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY day, event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_events,
           SUM(sum_cents) / 100.0 AS total_value
    FROM daily GROUP BY event_type
    """,
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("csv_roundtrip")
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    write_csv(daily, path, n_files=1)
    back = read_csv(spark, path, _DAILY_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
        (F.sum("sum_cents") / 100.0).alias("total_value"),
    )


# --------------------------------------------------------------------
# Hive-style partitioned layout + partition pruning: write events
# partitioned by event_type, read back ONE partition. The re-read's
# filter prunes at the DIRECTORY level (PartitionFilters in the scan,
# asserted in tests/test_plans.py) — at 100 TB this is the difference
# between listing one partition's files and scanning the lake. The
# date-partitioned ingest layout every production pipeline uses.
# --------------------------------------------------------------------
@query(
    "io_partitioned_pruning",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events WHERE event_type = 'error'
    GROUP BY day
    """,
)
def io_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = _partitioned_events(spark, sf_dir).filter(
        F.col("event_type") == "error"
    )
    return back.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )


def _partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the partitioned layout (once per process+sf) and return
    the re-read DataFrame; shared by the query and the plan test."""
    real = os.path.realpath(sf_dir)
    import hashlib as _hl

    key = (
        os.path.basename(os.path.normpath(sf_dir))
        + "_" + _hl.md5(real.encode()).hexdigest()[:8]
    )  # realpath-derived: same-basename fixture dirs must not collide
    path = scratch_dir(f"partitioned_events_{key}")
    if key not in _PARTITIONED_WRITTEN:
        staged = load(spark, sf_dir, "events").select(
            "event_id",
            "ts",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        write_parquet(staged, path, partition_by=["event_type"])
        # capture the write-side schema so later calls don't rebuild
        # the source lineage (footer read + nanos-rebuild select) just
        # to name it
        _PARTITIONED_WRITTEN[key] = staged.schema
    # explicit read schema: a zero-row day writes NO parquet files into
    # the partition dirs, and schema inference over an empty layout
    # fails — the write-side schema is the contract either way
    return spark.read.schema(_PARTITIONED_WRITTEN[key]).parquet(path)


_PARTITIONED_WRITTEN: dict[str, "object"] = {}


_ROUNDTRIP_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY day, event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_events,
           SUM(sum_cents) / 100.0 AS total_value
    FROM daily GROUP BY event_type
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
    )


def _daily_checksum(back: DataFrame) -> DataFrame:
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
        (F.sum("sum_cents") / 100.0).alias("total_value"),
    )


# --------------------------------------------------------------------
# ORC write -> explicit-schema read -> aggregate. ORC is the other
# columnar format Spark ships natively (stripe-level min/max skipping
# like parquet row groups); same writer/reader discipline.
# --------------------------------------------------------------------
@query("io_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("orc_roundtrip")
    _daily(spark, sf_dir).coalesce(1).write.mode("overwrite").orc(path)
    back = spark.read.schema(_DAILY_SCHEMA).orc(path)
    return _daily_checksum(back)


# --------------------------------------------------------------------
# XML write -> explicit-schema read -> aggregate. Spark 4 ships the
# XML source natively (rowTag framing). The lossiest wire format of
# the set — everything is text until the read schema types it — hence
# the explicit schema on re-read, as with CSV/JSON.
# --------------------------------------------------------------------
@query("io_xml_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def io_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("xml_roundtrip")
    (
        _daily(spark, sf_dir)
        .coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "days")
        .option("rowTag", "day_row")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "day_row")
        .schema(_DAILY_SCHEMA)
        .load(path)
    )
    return _daily_checksum(back)


# --------------------------------------------------------------------
# Avro write -> explicit-schema read -> aggregate, with NO spark-avro
# jar: the container ships none, so the engine implements the Avro 1.11
# Object Container File format itself (sources/avro_py.py — pure-Python
# binary codec on Spark 4's DataSource API, one container file per
# partition, two-phase commit). Same explicit-read-schema discipline as
# CSV/JSON/XML; date goes through the int/date logical type exactly as
# spark-avro writes it, so the files interchange with any Avro reader.
# --------------------------------------------------------------------
@query("io_avro_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def io_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.avro_py import register_avro_source

    # re-registration is idempotent (latest registration wins), so no
    # guard: a genuine registration failure should surface HERE, not
    # as a later DATA_SOURCE_NOT_FOUND
    register_avro_source(spark)
    path = scratch_dir("avro_roundtrip")
    (
        _daily(spark, sf_dir)
        .coalesce(1)
        .write.format("avro_py")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("avro_py").schema(_DAILY_SCHEMA).load(path)
    )
    return _daily_checksum(back)


# --------------------------------------------------------------------
# JSON-lines write -> explicit-schema JSON read -> aggregate: the
# third interchange format next to parquet/CSV. JSON is the lossiest
# of the three (no int32/int64 distinction on the wire, no binary),
# so the roundtrip goes through an explicit read schema — never
# inferSchema, which costs a full extra pass AND can flip types
# between runs. Timestamps survive via ISO-8601 strings.
# --------------------------------------------------------------------
@query("io_json_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("json_roundtrip")
    _daily(spark, sf_dir).coalesce(1).write.mode("overwrite").json(path)
    back = spark.read.schema(_DAILY_SCHEMA).json(path)
    return _daily_checksum(back)


# --------------------------------------------------------------------
# Schema evolution on read (mergeSchema): two parquet batches written
# with different schemas — the second adds a column — read back as one
# dataset with the union schema, old rows NULL in the new column.
# The append-only table-growth pattern; explicit mergeSchema because
# the default (first-file schema) would silently DROP the new column.
# --------------------------------------------------------------------
@query(
    "io_schema_evolution",
    oracle="""
    WITH unioned AS (
        SELECT o_orderkey, o_totalprice, NULL AS priority_rank
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice,
               CAST(substring(o_orderpriority, 1, 1) AS INT)
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(priority_rank) AS BIGINT) AS n_with_rank,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_cents,
        CAST(COALESCE(SUM(priority_rank), 0) AS BIGINT) AS rank_sum
    FROM unioned
    """,
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("schema_evolution")
    orders = load(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).cast("int").alias(
            "priority_rank"
        ),
    )
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("priority_rank").alias("n_with_rank"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
        F.coalesce(F.sum("priority_rank"), F.lit(0)).cast("long").alias(
            "rank_sum"
        ),
    )


# --------------------------------------------------------------------
# File-source metadata columns (the hidden ``_metadata`` struct):
# per-source-file row provenance — file name, size, modification time
# — selectable with zero extra I/O (constant-folded from the scan's
# own file listing). At 100 TB this is the built-in lineage/debugging
# tool: "which ingest file produced this corrupt row" without a
# custom input_file_name pipeline. The fixture is single-file, so the
# oracle pins the (name, row-count) pair exactly.
# --------------------------------------------------------------------
@query(
    "io_metadata_columns",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    HAVING COUNT(*) > 0
    """,
)
def io_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .select(F.expr("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --------------------------------------------------------------------
# binaryFile source: Spark's scan for opaque payloads (images, audio
# — the ingest edge of the multimodal family, which otherwise reads
# payloads from parquet binary columns). A bounded set of document
# texts is materialized as one file per doc, re-scanned with
# format("binaryFile"), and digest-compared against the source table
# — a correct scan preserves every byte. pathGlobFilter prunes the
# listing; at scale the source parallelizes by file, so "many small
# files" is the real layout risk (see datapipe compaction).
# --------------------------------------------------------------------
_BINARYFILE_CAP = 24


@query(
    "io_binaryfile_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    WHERE doc_id < {_BINARYFILE_CAP}
          AND text IS NOT NULL AND strlen(text) > 0
    """,
)
def io_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("binaryfile_scan")
    os.makedirs(path, exist_ok=True)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BINARYFILE_CAP)
        # a NULL or empty doc lands no file: there are no bytes, and
        # Spark's binaryFile source skips zero-byte files anyway —
        # making the contract explicit keeps the oracle exact
        .filter(F.octet_length("text") > 0)
        .select("doc_id", "text")
        .collect()  # bounded: < _BINARYFILE_CAP rows, fixture setup only
    )
    keep = {f"{r['doc_id']}.bin" for r in docs}
    for fname in os.listdir(path):  # idempotent reruns, stale-file-safe
        if fname.endswith(".bin") and fname not in keep:
            os.remove(os.path.join(path, fname))
    for r in docs:
        with open(os.path.join(path, f"{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha"),
    )


# --------------------------------------------------------------------
# text source/sink: newline-delimited plain text, the rawest corpus
# interchange format. Write the bounded doc set as .txt part files,
# re-read with spark.read.text, and profile — the oracle computes the
# same profile straight from the table (value-neutral round-trip,
# same contract as the CSV/JSON/ORC/XML roundtrips above).
# --------------------------------------------------------------------
@query(
    "io_text_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           -- length() (code points) not strlen() (bytes): Spark's
           -- length() counts code points, and unicode corpora differ
           CAST(SUM(length(line)) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(line, ' '))) AS BIGINT) AS total_tokens
    FROM (
        -- the text sink writes a NULL doc as an empty line (a
        -- line-oriented format has no NULL), so the round-trip
        -- profile sees '' — mirror that here
        SELECT replace(replace(COALESCE(text, ''), chr(10), ' '),
                       chr(13), ' ') AS line
        FROM documents
    )
    """,
)
def io_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("text_roundtrip")
    # newlines ARE the sink's record delimiter: a doc containing one
    # would split into extra lines on re-read and break the
    # one-line-per-doc contract (the fixture is newline-free; this
    # normalization makes the round-trip hold for any corpus). NULL
    # docs become empty lines EXPLICITLY — a line-oriented format has
    # no NULL, and relying on the writer's null handling is implicit.
    (
        load(spark, sf_dir, "documents")
        .select(
            F.translate(
                F.coalesce(F.col("text"), F.lit("")), "\n\r", "  "
            ).alias("value")
        )
        .coalesce(2)
        .write.mode("overwrite")
        .text(path)
    )
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.sum(F.size(F.split(F.col("value"), " ")))
        .cast("long")
        .alias("total_tokens"),
    )


# --------------------------------------------------------------------
# Dynamic partition overwrite: the incremental-reload primitive — a
# date-partitioned table gets ONE day rewritten in place;
# partitionOverwriteMode=dynamic replaces only the partitions the
# incoming frame touches instead of truncating the table (the
# default STATIC mode would wipe the other 29 days). At scale this
# is how daily corrections land: O(changed day), not O(table).
# The oracle computes the expected post-overwrite state straight
# from the source (day-05 rows doubled), so a wrong overwrite scope
# — every other day lost, or day 05 duplicated — breaks parity.
# --------------------------------------------------------------------
_DYN_DAY = "2024-01-05"


@query(
    "io_dynamic_partition_overwrite",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN CAST(ts AS DATE) = DATE '{_DYN_DAY}'
                         THEN CAST(ROUND(value * 100) AS BIGINT) * 2
                         ELSE CAST(ROUND(value * 100) AS BIGINT)
                    END) AS BIGINT) AS total_cents
    FROM events
    """,
)
def io_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("dyn_overwrite")
    staged = load(spark, sf_dir, "events").select(
        "event_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    staged.write.mode("overwrite").partitionBy("day").parquet(path)
    patch = (
        staged.filter(F.col("day") == F.lit(_DYN_DAY).cast("date"))
        .withColumn("cents", F.col("cents") * 2)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # explicit schema for the same zero-row reason as _partitioned_events
    back = spark.read.schema(staged.schema).parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("day").cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# --------------------------------------------------------------------
# Malformed-record quarantine (the PERMISSIVE + _corrupt_record
# ingestion pattern): real JSONL feeds always carry broken lines, and
# the at-scale discipline is route-and-count, never fail-the-job
# (FAILFAST dies on line one of 100 TB) and never silent drop
# (DROPMALFORMED hides upstream rot). The fixture's JSONL is written
# with DETERMINISTIC corruption (every doc_id % 7 == 0 line is
# truncated mid-record), read back PERMISSIVE with the corrupt
# column, and summarized per source: clean vs quarantined counts.
# The oracle recomputes the same partition arithmetic from the clean
# table — if the engine misroutes a single line either way, counts
# mismatch.
# --------------------------------------------------------------------
@query(
    "io_jsonl_quarantine",
    oracle="""
    SELECT source,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars ELSE 0 END)
                AS BIGINT) AS clean_chars
    FROM documents
    WHERE source IS NOT NULL
    GROUP BY source
    """,
)
def io_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .select("doc_id", "source", "n_chars", "text")
    )
    path = scratch_dir("jsonl_quarantine")
    # Build the corrupted feed with the SAME engine (one map, one text
    # write): corrupt lines are truncated mid-JSON — unparseable, not
    # just schema-mismatched.
    # truncation drops the tail (never the head) so the early fields
    # (doc_id, source) survive in the fragment for quarantine
    # attribution, while the JSON is guaranteed unparseable
    line = F.to_json(F.struct("doc_id", "source", "n_chars", "text"))
    feed = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            line.substr(F.lit(1), F.length(line) - 5),
        )
        .otherwise(line)
        .alias("value")
    )
    feed.coalesce(1).write.mode("overwrite").text(path)
    schema = (
        "doc_id bigint, source string, n_chars bigint, text string, "
        "_corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Quarantined rows surface via _corrupt_record; sources for them
    # are recovered from the raw fragment so the report can still
    # bucket rot by feed (tail-truncation preserves the early
    # `"source":"s"` field) — regexp pulls it back out. One select
    # referencing BOTH data and corrupt columns (Spark refuses plans
    # whose JSON scan references only the internal corrupt column),
    # then one aggregate — no split/union, single pass.
    rows = back.select(
        F.coalesce(
            "source",
            F.regexp_extract(
                F.col("_corrupt_record"), '"source":"([^"]*)', 1
            ),
        ).alias("source"),
        F.when(F.col("_corrupt_record").isNull(), 1)
        .otherwise(0)
        .alias("clean"),
        "n_chars",
    )
    return rows.groupBy("source").agg(
        F.sum("clean").alias("n_clean"),
        F.sum(1 - F.col("clean")).alias("n_quarantined"),
        F.sum(
            F.when(F.col("clean") == 1, F.col("n_chars")).otherwise(0)
        ).alias("clean_chars"),
    )


# --------------------------------------------------------------------
# Globally range-partitioned sorted write (the terasort layout) + a
# per-file min/max audit — the classic distributed-sort primitive:
# repartitionByRange samples split points and hash-exchanges rows
# into disjoint key ranges, sortWithinPartitions sorts each range
# locally (no single-reducer global sort anywhere), and the written
# files form one globally sorted run. That layout is what makes
# downstream range predicates prune entire files via parquet
# min/max footers at 100 TB. The audit re-reads the output and
# verifies the contract the layout promises, as data:
#   * per-file key ranges are pairwise DISJOINT (file i's min above
#     file i-1's max) — checked with a lag window over the tiny
#     O(files) stats frame;
#   * rows are sorted INSIDE each file — monotonically_increasing_id
#     ascends in read order within a file, so a lag window per file
#     catches any (price, orderkey) inversion;
#   * the file count stays at the requested width (8), not an
#     explosion of tiny files.
# Only the invariants (violations == 0, width ok) plus data-level
# totals (count / min / max, bit-exact raw doubles) are emitted, so
# the oracle pairs exactly despite range boundaries being
# implementation-defined.
# --------------------------------------------------------------------
@query(
    "io_sorted_write_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS min_key,
           MAX(o_totalprice) AS max_key,
           1 AS width_ok,
           CAST(0 AS BIGINT) AS boundary_overlaps,
           CAST(0 AS BIGINT) AS intra_file_inversions
    FROM orders
    """,
)
def io_sorted_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    path = scratch_dir("sorted_write")
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(8, "o_totalprice", "o_orderkey")
        .sortWithinPartitions("o_totalprice", "o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "o_totalprice",
        "o_orderkey",
        F.input_file_name().alias("f"),
        # ascends in read order inside every file (files are read
        # sequentially within a split, so per-file order is preserved
        # even when several small files pack into one split)
        F.monotonically_increasing_id().alias("mid"),
    )
    w_file = Window.partitionBy("f").orderBy("mid")
    cur = F.struct("o_totalprice", "o_orderkey")
    inversions = back.select(
        F.when(F.lag(cur).over(w_file) > cur, 1).otherwise(0).alias("inv"),
        "o_totalprice",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("min_key"),
        F.max("o_totalprice").alias("max_key"),
        # count-if, not sum: SUM over a zero-row write is NULL where
        # the oracle's literal 0 means "no violations"
        F.count(F.when(F.col("inv") == 1, 1)).alias(
            "intra_file_inversions"
        ),
    )
    stats = back.groupBy("f").agg(
        F.min("o_totalprice").alias("minp"),
        F.max("o_totalprice").alias("maxp"),
    )
    # O(files) frame: the global lag window holds <= 8 rows
    w_files = Window.orderBy("minp", "f")
    overlaps = stats.select(
        F.when(F.lag("maxp").over(w_files) > F.col("minp"), 1)
        .otherwise(0)
        .alias("ov")
    ).agg(
        F.count(F.when(F.col("ov") == 1, 1)).alias("boundary_overlaps"),
        (F.count(F.lit(1)) <= 8).cast("int").alias("width_ok"),
    )
    return inversions.crossJoin(overlaps).select(
        "n_rows",
        "min_key",
        "max_key",
        "width_ok",
        "boundary_overlaps",
        "intra_file_inversions",
    )
