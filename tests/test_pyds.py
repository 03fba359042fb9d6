"""Custom Python Data Source (Spark 4 API): partitioned reads + filter
pushdown across the Python boundary must preserve exact semantics."""

from __future__ import annotations

from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

from big_data_backblaze_hard_drive_failure_spark.sources.pyds import (
    SyntheticEventsReader,
    _row,
    register_synthetic_source,
)


def _read(spark, n_partitions=3, rows=100):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_partitions", n_partitions)
        .option("rows_per_partition", rows)
        .load()
    )


def test_partitioned_deterministic_read(spark):
    df = _read(spark)
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(_row(i) for i in range(300))


def test_filter_pushdown_preserves_semantics(spark):
    """Pushed (EqualTo / GreaterThan on user_id) and non-pushed
    (value predicate, re-applied by Spark) filters must both yield
    exactly the brute-force truth."""
    df = _read(spark)
    truth = [_row(i) for i in range(300)]

    eq = sorted(tuple(r) for r in df.filter("user_id = 5").collect())
    assert eq == sorted(r for r in truth if r[1] == 5) and len(eq) > 0

    gt = sorted(tuple(r) for r in df.filter("user_id > 90").collect())
    assert gt == sorted(r for r in truth if r[1] > 90) and len(gt) > 0

    mixed = sorted(
        tuple(r) for r in df.filter("user_id > 90 AND value < 50").collect()
    )
    assert mixed == sorted(r for r in truth if r[1] > 90 and r[3] < 50)


def test_push_filters_contract():
    """pushFilters returns exactly the filters it does NOT handle;
    handled ones configure the generator."""
    reader = SyntheticEventsReader({"n_partitions": "2"})
    leftover = list(
        reader.pushFilters(
            [
                EqualTo(("user_id",), 7),
                GreaterThan(("user_id",), 3),
                IsNotNull(("event_type",)),
            ]
        )
    )
    assert leftover == [IsNotNull(("event_type",))]
    assert reader.user_eq == 7 and reader.user_gt == 3
    assert len(reader.partitions()) == 2


def test_stream_source_offsets_and_resume(spark, tmp_path):
    """The streaming variant: micro-batch offsets checkpoint and
    RESUME exactly — two trigger-once runs against one checkpoint must
    produce consecutive, non-overlapping id ranges (the exactly-once
    contract readBetweenOffsets exists to honor)."""
    register_synthetic_source(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("synthetic_events")
            .option("batch_rows", 50)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 >= 50  # at least the first batch landed
    run_once()
    rows = sorted(
        r["event_id"] for r in spark.read.parquet(out).select("event_id").collect()
    )
    n2 = len(rows)
    assert n2 > n1, "second run made no progress"
    # consecutive, gap-free, duplicate-free id space from 0
    assert rows == list(range(n2)), (rows[:5], rows[-5:], n2)
    # content is the deterministic generator output
    sample = spark.read.parquet(out).filter("event_id = 7").first()
    assert tuple(sample) == _row(7)


def test_jsonl_writer_commit_protocol_roundtrip(spark, tmp_path):
    """Custom writer with two-phase commit: only commit() publishes
    part files + _SUCCESS (no temp files survive), and a write -> read
    round-trip through the Python source preserves exact content."""
    import json
    import os

    from big_data_backblaze_hard_drive_failure_spark.sources.pyds import (
        JsonlCommitMessage,
        JsonlWriter,
        register_jsonl_source,
    )

    register_jsonl_source(spark)
    target = str(tmp_path / "jsonl")
    src = _read(spark, n_partitions=3, rows=40)
    src.write.format("jsonl_dir").option("path", target).mode("append").save()

    names = sorted(os.listdir(target))
    assert "_SUCCESS" in names
    assert not any(n.startswith("_temp-") for n in names), names
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 3  # one per input partition
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest["n_rows"] == 120 and manifest["n_files"] == 3

    back = (
        spark.read.format("jsonl_dir")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .option("path", target)
        .load()
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(_row(i) for i in range(120))

    # abort removes temps: simulate a failed task's cleanup
    w = JsonlWriter({"path": target}, overwrite=False)
    tmp_file = os.path.join(target, "_temp-dead.jsonl")
    open(tmp_file, "w").write("{}\n")
    w.abort([JsonlCommitMessage(temp_path=tmp_file, n_rows=1)])
    assert not os.path.exists(tmp_file)


def test_jsonl_writer_append_preserves_prior_commits(spark, tmp_path):
    """Append-mode commits must never clobber an earlier commit's part
    files (part names are commit-scoped), and _SUCCESS must describe
    the whole directory, not just the last commit."""
    import json
    import os

    d = str(tmp_path / "jsonl_append")
    df1 = spark.range(0, 5).selectExpr("id", "CAST(id AS STRING) AS s")
    df2 = spark.range(5, 12).selectExpr("id", "CAST(id AS STRING) AS s")
    df1.coalesce(2).write.format("jsonl_dir").option("path", d).mode(
        "append"
    ).save()
    df2.coalesce(3).write.format("jsonl_dir").option("path", d).mode(
        "append"
    ).save()
    back = (
        spark.read.format("jsonl_dir")
        .schema("id LONG, s STRING")
        .option("path", d)
        .load()
    )
    assert {r["id"] for r in back.collect()} == set(range(12))
    with open(os.path.join(d, "_SUCCESS")) as f:
        meta = json.load(f)
    assert meta["n_rows"] == 12
    assert meta["n_files"] == sum(
        1 for n in os.listdir(d) if n.startswith("part-")
    )

    # overwrite still resets the directory
    df1.coalesce(1).write.format("jsonl_dir").option("path", d).mode(
        "overwrite"
    ).save()
    back2 = (
        spark.read.format("jsonl_dir")
        .schema("id LONG, s STRING")
        .option("path", d)
        .load()
    )
    assert {r["id"] for r in back2.collect()} == set(range(5))


def test_avro_roundtrip_all_types_with_nulls(spark, tmp_path):
    """The pure-Python Avro OCF connector must round-trip every mapped
    Spark type, including NULLs in every column (the ["null", T] union
    branch) and negative numbers (zigzag edge)."""
    import datetime

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        register_avro_source,
    )

    register_avro_source(spark)
    rows = [
        (1, -12345678901, 2.5, "héllo", True, bytearray(b"\x00\xff"),
         datetime.date(2026, 8, 14)),
        (2, None, None, None, None, None, None),
        (3, 0, -0.0, "", False, bytearray(b""), datetime.date(1969, 12, 31)),
    ]
    schema = (
        "id LONG, big LONG, x DOUBLE, s STRING, b BOOLEAN, "
        "raw BINARY, d DATE"
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "avro_all")
    df.write.format("avro_py").mode("overwrite").save(path)
    back = spark.read.format("avro_py").schema(df.schema).load(path)
    got = sorted(
        (tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
               for v in r) for r in back.collect())
    )
    want = sorted(
        (tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
               for v in r) for r in rows)
    )
    assert got == want


def test_avro_file_is_spec_conformant_container(spark, tmp_path):
    """Byte-level spec checks on the written file: Obj\\x01 magic,
    avro.schema metadata holding a record of nullable fields, the null
    codec, and a sync marker terminating each block."""
    import glob
    import json as _json

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        register_avro_source,
    )

    register_avro_source(spark)
    path = str(tmp_path / "avro_spec")
    spark.range(10).toDF("id").coalesce(1).write.format(
        "avro_py"
    ).mode("overwrite").save(path)
    [f] = glob.glob(f"{path}/part-*.avro")
    raw = open(f, "rb").read()
    assert raw[:4] == b"Obj\x01"
    i = raw.index(b"avro.schema")
    # metadata value is a length-prefixed JSON blob right after the key
    j = raw.index(b'{"type": "record"', i)
    depth = 0
    for k in range(j, len(raw)):
        depth += {ord("{"): 1, ord("}"): -1}.get(raw[k], 0)
        if depth == 0:
            break
    meta = _json.loads(raw[j:k + 1])
    assert [fld["type"] for fld in meta["fields"]] == [["null", "long"]]
    assert b"null" in raw[raw.index(b"avro.codec"):][:20]
    # last 16 bytes of the file are the block-terminating sync marker,
    # which must equal the marker right after the metadata section
    sync = raw[-16:]
    assert raw.count(sync) >= 2


def test_avro_writer_overwrite_and_abort_semantics(spark, tmp_path):
    """Overwrite replaces previous parts; a failed job leaves no part
    files behind (only the temp of the failed task is cleaned)."""
    import glob

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        register_avro_source,
    )

    register_avro_source(spark)
    path = str(tmp_path / "avro_ow")
    spark.range(5).toDF("id").write.format("avro_py").mode(
        "overwrite"
    ).save(path)
    spark.range(3).toDF("id").write.format("avro_py").mode(
        "overwrite"
    ).save(path)
    back = spark.read.format("avro_py").schema("id LONG").load(path)
    assert back.count() == 3
    assert not glob.glob(f"{path}/_temp-*")


def test_avro_writer_abort_removes_temps(tmp_path):
    """abort() after successful task writes: every temp gone (None
    entries for unfinished tasks tolerated), nothing committed, and a
    subsequent reader sees zero part files."""
    from pyspark.sql import types as T

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        AvroWriter,
    )

    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    w = AvroWriter({"path": str(tmp_path / "t")}, schema, overwrite=True)
    m1 = w.write(iter([(1,), (2,)]))
    m2 = w.write(iter([(3,)]))
    import os

    assert os.path.exists(m1.temp_path) and os.path.exists(m2.temp_path)
    w.abort([m1, None, m2])
    left = os.listdir(str(tmp_path / "t"))
    assert left == []
    # abort is idempotent (driver may retry it)
    w.abort([m1, None, m2])


def test_avro_timestamp_stores_true_epoch_micros(tmp_path):
    """The file must hold TRUE epoch micros for TimestampType (what
    fastavro/spark-avro would read), not the local wall clock
    reinterpreted as UTC: encode inverts PySpark's fromInternal
    (process-local mktime), so epoch micros are recovered exactly.
    TimestampNTZ stays wall-clock and is tagged with the
    local-timestamp-micros logical type per the spec."""
    import datetime
    import io as _io
    import json as _json
    import time

    from pyspark.sql import types as T

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        _avro_type,
        _decode_value,
        _encode_value,
        _zigzag_decode,
    )

    v = datetime.datetime(2026, 8, 14, 12, 0, 0, 123456)
    enc = _encode_value(T.TimestampType(), v)
    micros = _zigzag_decode(_io.BytesIO(enc))
    want = int(time.mktime(v.timetuple())) * 1_000_000 + v.microsecond
    assert micros == want
    # decode returns the identical naive local datetime
    assert _decode_value(T.TimestampType(), _io.BytesIO(enc)) == v
    # aware datetimes convert through their own offset
    aware = v.replace(tzinfo=datetime.timezone.utc)
    enc_aware = _encode_value(T.TimestampType(), aware)
    assert _zigzag_decode(_io.BytesIO(enc_aware)) == (
        int(aware.timestamp()) * 1_000_000 + aware.microsecond
    )
    # NTZ: wall-clock micros, spec's local-timestamp logical type
    enc_ntz = _encode_value(T.TimestampNTZType(), v)
    ntz_micros = _zigzag_decode(_io.BytesIO(enc_ntz))
    epoch = datetime.datetime(1970, 1, 1)
    assert ntz_micros == int((v - epoch).total_seconds() * 1_000_000)
    assert _json.dumps(_avro_type(T.TimestampNTZType())) == _json.dumps(
        {"type": "long", "logicalType": "local-timestamp-micros"}
    )
    assert _json.dumps(_avro_type(T.TimestampType())) == _json.dumps(
        {"type": "long", "logicalType": "timestamp-micros"}
    )


def test_avro_read_schema_type_mismatch_raises(tmp_path):
    """A read schema with matching names but a wrong TYPE must fail
    loudly (the embedded writer schema is the truth) instead of
    desyncing the varint stream into garbage rows."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        read_ocf,
        write_ocf,
    )

    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    path = str(tmp_path / "f.avro")
    write_ocf(path, schema, [(1,), (2,)])
    bad = T.StructType([T.StructField("id", T.DoubleType(), True)])
    with _pytest.raises(ValueError, match="read schema"):
        list(read_ocf(path, bad))
