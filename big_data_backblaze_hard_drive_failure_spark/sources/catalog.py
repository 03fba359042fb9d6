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


def _fan_out_small_scan(
    spark: SparkSession, df: DataFrame, path: str, keys: tuple[str, ...]
) -> DataFrame:
    """Raise map-side parallelism for a scan whose WHOLE input fits in
    one split, by hash-repartitioning on the table's primary key.

    Why (optimization guide §2.5 input skew / §6 split sizing): Spark
    sizes scan tasks by ``spark.sql.files.maxPartitionBytes``; a table
    smaller than one split — and parquet written as a single row
    group, which byte-range splits cannot subdivide — scans as ONE
    task, so every expression evaluated before the first exchange
    (tokenize / shingle / md5 MinHash / explode) runs on one core
    while the rest of the machine idles. Round-13 measured the
    MinHash-signature pipeline spending ~90% of its wall clock in that
    single scan task at sf0.1 on local[32].

    The guard makes this scale-adaptive, not a local-mode constant:
    it fires ONLY when the table's on-disk bytes fit inside a single
    scan split (the exact condition under which Spark cannot
    parallelize the scan itself). At production scale the input is
    thousands of splits, the branch is dead, and the plan is
    byte-identical to before — no extra exchange ever ships corpus
    text. Partitioning on the PRIMARY KEY (not round-robin) keeps the
    exchange deterministic and lets any downstream groupBy on the same
    key reuse the partitioning instead of adding its own exchange
    (guide §2.4); the partition count is the session shuffle width
    pinned explicitly so AQE cannot coalesce the fan-out back to one
    task (coalescing by size is what a ~5 MB input would get).
    """
    # escape hatch + A/B instrument: the committed evidence for this
    # operator (OPTIMIZATION_r13.md) interleaves on/off in ONE session
    # because wall-clock on this host drifts minute-to-minute under
    # co-tenancy; production can also disable it without a code change
    if os.environ.get("SPARK_GRAFT_NO_FANOUT"):
        return df
    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return df
    # NOTE: the size guard walks the LOCAL filesystem — for object-store
    # URIs os.walk/getsize raise OSError and the fan-out silently no-ops,
    # which is the intended production behavior (the branch only exists
    # for single-split local inputs).
    #
    # Conf values can legally be suffixed sizes ("128m", "1g") or even
    # "auto" in some managed runtimes; int() would raise and break every
    # load(). Fall back to the plain scan on any unparsable conf, same
    # as the OSError path above.
    try:
        max_split = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return df
    if size >= max_split or width <= 1:
        return df
    return df.repartition(width, *[F.col(k) for k in keys])


def load(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fan_out_by: tuple[str, ...] | None = None,
) -> DataFrame:
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
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("convert_timezone('UTC', timestamp_micros(ts div 1000))"),
        )
    if fan_out_by:
        df = _fan_out_small_scan(spark, df, path, fan_out_by)
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
