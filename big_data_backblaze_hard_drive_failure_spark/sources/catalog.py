"""Table registry over a parquet scale-factor directory.

The reference reads raw CSV with ``inferSchema=True``
(/root/reference/scripts/01_data_ingestion.py:17-22), which costs an
extra full pass over the input before the plan exists. The engine keeps
explicit schemas (below) so CSV ingestion is single-pass and
deterministic; parquet scans carry their own schema and only use the
registry for validation and view registration.

Scale note: every loader returns a lazily-planned DataFrame; Catalyst
pushes projections and predicates into the parquet scan, so callers can
``load(...).select(...).filter(...)`` without reading unneeded bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for the driver fixture tables (FIXTURES.md §2) —
# used for CSV ingestion (reference S1) and schema assertions.
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def schema_for(name: str) -> T.StructType:
    return TABLES[name]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS) which Spark's
    vectorized parquet reader rejects; we read it as raw nanos
    (``nanosAsLong``, set per-call so it works under any session) and
    rebuild a microsecond TIMESTAMP_NTZ. Two subtleties:
      * integer division (``div``) — float division loses precision
        above 2^53 ns;
      * ``convert_timezone('UTC', ...)`` — ``timestamp_micros`` alone
        yields an instant whose rendered wall-clock (and to_date!)
        depends on the session timezone; converting to NTZ pins the
        stored naive value under ANY session, matching how Spark reads
        the other fixtures' ms timestamps (TIMESTAMP_NTZ) and how the
        DuckDB oracle sees them.
    """
    # set-once guard: only touch the caller's session conf if the
    # setting isn't already what we need (avoids a surprising mutation
    # on every load() call in someone else's SparkSession)
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("convert_timezone('UTC', timestamp_micros(ts div 1000))"),
        )
    return df


def load_csv(spark: SparkSession, path: str, name: str) -> DataFrame:
    """CSV directory scan of a CATALOG table (reference S1,
    /root/reference/scripts/01_data_ingestion.py:17-22, minus the
    inferSchema pre-pass). Thin wrapper over sinks.read_csv with the
    registered schema — one CSV reader implementation."""
    from .sinks import read_csv

    return read_csv(spark, path, TABLES[name])


def register_all(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register fixture tables as temp views for spark.sql(); pass
    ``tables`` to register only what a query touches (skips the
    parquet-footer metadata read for the other nine tables)."""
    for name in tables if tables is not None else TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
