"""Avro source/sink as a pure-Python Spark DataSource — no external jar.

The container ships no ``spark-avro`` package (and has no network), but
Avro interchange is a standard ask of an analytics engine, so this
module implements the Avro 1.11 **Object Container File** format from
the public specification directly on Spark 4's Python DataSource API:
``df.write.format("avro_py").save(path)`` /
``spark.read.format("avro_py").schema(s).load(path)``.

Wire format (Avro spec "Object Container Files" + "Binary encoding"):
  magic ``Obj\\x01`` -> file-metadata map (``avro.schema`` JSON,
  ``avro.codec`` = null) -> 16-byte sync marker -> data blocks, each
  ``(row count varint, byte size varint, payload, sync marker)``.
Scalars use Avro binary encoding: zigzag varints for int/long,
little-endian IEEE754 for float/double, length-prefixed UTF-8 for
string/bytes, one byte for boolean; nullable columns are the standard
``["null", T]`` union (branch index varint before the value). Date is
the ``int``/``date`` logical type (days since epoch), timestamp the
``long``/``timestamp-micros`` logical type — the same physical mapping
spark-avro uses, so files interchange with any Avro reader.

Scale shape: identical to the engine's other file connectors — the
writer emits ONE container file per Spark partition into a temp name
and renames on commit (two-phase, crash-safe, same protocol as
``JsonlDataSource``); the reader maps one Spark partition per file, so
read parallelism is the file count and each task streams blocks
without materializing the whole file.

[beyond-reference] interchange surface; the reference only reads CSV
(/root/reference/scripts/01_ingestion.py:17-28).
"""

from __future__ import annotations

import io
import json
import struct

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from .pyds import FileCommitMessage, TwoPhaseDirectoryWriter

_MAGIC = b"Obj\x01"

# -- Avro binary primitives (spec: "Binary encoding") -----------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    if 0 <= u < 0x80:  # one-byte fast path (the common small varint)
        return bytes((u,))
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BufferedIOBase) -> int:
    shift = 0
    u = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _dec_bytes(buf) -> bytes:
    n = _zigzag_decode(buf)
    return buf.read(n)


# -- Spark <-> Avro schema mapping ------------------------------------

_EPOCH_ORDINAL = 719163  # datetime.date(1970, 1, 1).toordinal()


def _avro_type(dt: T.DataType) -> object:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        # instant semantics: micros since the UTC epoch
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        # wall-clock semantics, no zone — the spec's local-timestamp
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    raise ValueError(f"avro_py does not map Spark type {dt}")


def _avro_schema_json(schema: T.StructType) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": "spark_row",
            "fields": [
                {"name": f.name, "type": ["null", _avro_type(f.dataType)]}
                for f in schema.fields
            ],
        }
    )


def _make_encoder(dt: T.DataType):
    """Resolve the Spark type to a value-encoder closure ONCE per
    schema; the per-row hot loop then runs no isinstance dispatch
    (the row-at-a-time Python DataSource path is the engine's slowest
    connector — this keeps its constant factor honest)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return lambda v: _zigzag_encode(int(v))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        pack = struct.Struct("<d").pack
        return lambda v: pack(float(v))
    if isinstance(dt, T.StringType):
        return lambda v: _enc_str(str(v))
    if isinstance(dt, T.BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(dt, T.BinaryType):
        return lambda v: _enc_bytes(bytes(v))
    if isinstance(dt, T.DateType):
        return lambda v: _zigzag_encode(v.toordinal() - _EPOCH_ORDINAL)
    if isinstance(dt, T.TimestampType):
        # PySpark hands the writer a NAIVE datetime in the PROCESS
        # local zone (TimestampType.fromInternal); mktime inverts that
        # exactly (it is what toInternal uses), so the file stores TRUE
        # epoch micros and a spec-compliant external reader (fastavro,
        # spark-avro) sees the same instant. Aware datetimes convert
        # via their own offset. Known caveat, inherited from PySpark's
        # own naive conversion: during a DST fall-back hour the naive
        # wall time is ambiguous and mktime picks one fold, so that
        # one local hour per year can land 3600s off under a
        # DST-observing process TZ — the engine's session factory pins
        # UTC, where the ambiguity cannot occur.
        import calendar
        import time

        def _enc_ts(v):
            if v.tzinfo is not None:
                secs = calendar.timegm(v.utctimetuple())
            else:
                secs = int(time.mktime(v.timetuple()))
            return _zigzag_encode(secs * 1_000_000 + v.microsecond)

        return _enc_ts
    if isinstance(dt, T.TimestampNTZType):
        # no-zone wall clock: the epoch arithmetic IS the value
        import calendar

        return lambda v: _zigzag_encode(
            calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        )
    raise ValueError(f"avro_py cannot encode Spark type {dt}")


def _encode_value(dt: T.DataType, v) -> bytes:
    return _make_encoder(dt)(v)


def _make_decoder(dt: T.DataType):
    """Per-field decoder closure, resolved once per schema (mirror of
    :func:`_make_encoder`)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return _zigzag_decode
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        unpack = struct.Struct("<d").unpack
        return lambda buf: unpack(buf.read(8))[0]
    if isinstance(dt, T.StringType):
        return lambda buf: _dec_bytes(buf).decode("utf-8")
    if isinstance(dt, T.BooleanType):
        return lambda buf: buf.read(1) == b"\x01"
    if isinstance(dt, T.BinaryType):
        return _dec_bytes
    if isinstance(dt, T.DateType):
        import datetime

        fromordinal = datetime.date.fromordinal
        return lambda buf: fromordinal(_zigzag_decode(buf) + _EPOCH_ORDINAL)
    if isinstance(dt, T.TimestampType):
        import datetime

        fromtimestamp = datetime.datetime.fromtimestamp
        delta = datetime.timedelta

        def _dec_ts(buf):
            micros = _zigzag_decode(buf)
            # local naive datetime, exactly what TimestampType.toInternal
            # expects back (integer split keeps full micro precision)
            return fromtimestamp(micros // 1_000_000) + delta(
                microseconds=micros % 1_000_000
            )

        return _dec_ts
    if isinstance(dt, T.TimestampNTZType):
        import datetime

        epoch = datetime.datetime(1970, 1, 1)
        delta = datetime.timedelta
        return lambda buf: epoch + delta(microseconds=_zigzag_decode(buf))
    raise ValueError(f"avro_py cannot decode Spark type {dt}")


def _decode_value(dt: T.DataType, buf):
    return _make_decoder(dt)(buf)


# -- Object Container File read/write ---------------------------------


def _sync_marker(schema_json: str) -> bytes:
    """Deterministic 16-byte marker derived from the schema: replayed
    writes produce byte-identical files (useful for tests; the spec
    only requires the marker be consistent within one file)."""
    import hashlib

    return hashlib.md5(schema_json.encode("utf-8")).digest()


def write_ocf(path: str, schema: T.StructType, rows, rows_per_block=4096):
    """Stream ``rows`` (sequences in field order) into one Avro OCF."""
    schema_json = _avro_schema_json(schema)
    sync = _sync_marker(schema_json)
    encoders = [_make_encoder(f.dataType) for f in schema.fields]
    n_total = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        meta = {"avro.schema": schema_json, "avro.codec": "null"}
        f.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            f.write(_enc_str(k))
            f.write(_enc_str(v))
        f.write(_zigzag_encode(0))  # end of metadata map
        f.write(sync)

        block = bytearray()
        n_block = 0

        def _flush():
            nonlocal block, n_block
            if not n_block:
                return
            f.write(_zigzag_encode(n_block))
            f.write(_zigzag_encode(len(block)))
            f.write(block)
            f.write(sync)
            block = bytearray()
            n_block = 0

        for row in rows:
            for enc, v in zip(encoders, row):
                if v is None:
                    block += b"\x00"  # union branch: null (zigzag 0)
                else:
                    block += b"\x02"  # union branch: value (zigzag 1)
                    block += enc(v)
            n_block += 1
            n_total += 1
            if n_block >= rows_per_block:
                _flush()
        _flush()
    return n_total


def read_ocf(path: str, schema: T.StructType):
    """Yield tuples (in ``schema`` field order) from one Avro OCF
    written by :func:`write_ocf` (null codec, record of nullable
    primitives)."""
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path} is not an Avro object container")
        n_meta = _zigzag_decode(f)
        meta = {}
        while n_meta:
            if n_meta < 0:
                # spec: a negative count is followed by the block's
                # byte size (allows skipping); consume and continue
                _zigzag_decode(f)
                n_meta = -n_meta
            for _ in range(n_meta):
                k = _dec_bytes(f).decode("utf-8")
                meta[k] = _dec_bytes(f)
            n_meta = _zigzag_decode(f)
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec != "null":
            raise ValueError(f"unsupported avro codec {codec}")
        # full structural check — NAME AND TYPE. A name-only check
        # would let a mistyped read schema desync the varint stream
        # and yield garbage; the embedded writer schema is the truth.
        file_fields = json.loads(meta["avro.schema"])["fields"]
        want = json.loads(_avro_schema_json(schema))["fields"]
        if file_fields != want:
            raise ValueError(
                f"avro file schema {file_fields} != read schema {want}"
            )
        sync = f.read(16)
        decoders = [_make_decoder(fld.dataType) for fld in schema.fields]
        while True:
            try:
                n_rows = _zigzag_decode(f)
            except EOFError:
                return
            n_bytes = _zigzag_decode(f)
            buf = io.BytesIO(f.read(n_bytes))
            for _ in range(n_rows):
                yield tuple(
                    dec(buf) if _zigzag_decode(buf) else None
                    for dec in decoders
                )
            if f.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch")


# -- Spark DataSource plumbing ----------------------------------------


# the commit protocol (and its message shape) is the shared
# TwoPhaseDirectoryWriter from pyds.py
AvroCommitMessage = FileCommitMessage


class AvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        # the caller supplies .schema(...) on read (same contract as
        # the engine's CSV/JSON/XML connectors: explicit read schemas)
        return "value STRING"

    def writer(self, schema, overwrite: bool) -> "AvroWriter":
        return AvroWriter(self.options, schema, overwrite)

    def reader(self, schema) -> "AvroReader":
        return AvroReader(self.options, schema)


class AvroWriter(TwoPhaseDirectoryWriter):
    """Two-phase commit shared with the JSONL sink
    (``sources/pyds.py:TwoPhaseDirectoryWriter``); only the
    serialization differs."""

    suffix = ".avro"
    format_name = "avro_py"

    def __init__(self, options, schema, overwrite: bool):
        super().__init__(options, overwrite)
        self.schema = schema

    def _write_temp(self, tmp: str, iterator) -> int:
        return write_ocf(tmp, self.schema, iterator)


class AvroReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.schema = schema

    def partitions(self):
        import os

        names = sorted(
            n for n in os.listdir(self.path) if n.startswith("part-")
        )
        return [InputPartition(os.path.join(self.path, n)) for n in names]

    def read(self, partition: InputPartition):
        yield from read_ocf(partition.value, self.schema)


def register_avro_source(spark) -> None:
    spark.dataSource.register(AvroDataSource)
