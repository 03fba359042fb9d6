"""SparkSession factory with the engine's tuned defaults.

The reference pins memory/shuffle knobs per script
(/root/reference/scripts/02_label_engineering.py:27-30 — 8g heap,
64 shuffle partitions, Arrow explicitly DISABLED). We invert the Arrow
decision (Arrow is required for fast pandas_udf / toPandas), enable AQE
so shuffle widths self-tune at any scale, and pin the session timezone
to UTC so results hash identically against the DuckDB oracle.

At 100 TB these defaults matter:
  * AQE coalesces post-shuffle partitions and splits skewed ones at
    runtime, replacing the reference's hand-tuned ``repartition(64)``.
  * ``maxPartitionBytes`` keeps scan tasks ~128 MB so a 1000-executor
    cluster gets well-sized, evenly distributed input splits.
  * Arrow makes every JVM<->Python crossing batch-columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big-data-backblaze-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
    pass ``master=None`` with externally-managed deploy config — every
    setting here is safe cluster-side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDTFs cross JVM<->Python Arrow-batched too (else they fall
        # back to the row-pickling BatchEvalPythonUDTF operator)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # let custom Python data sources receive Catalyst filters
        # (sources/pyds.py pushFilters — Spark 4.1 opt-in)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # scan splits sized for even distribution (reference relies on
        # default; explicit here because it is the #1 100TB knob)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # parquet writer tuning carried over from the reference
        # (scripts/02_label_engineering.py:161-163)
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.hadoop.parquet.block.size", str(64 * 1024 * 1024))
        .config("spark.hadoop.parquet.page.size", str(8 * 1024 * 1024))
        # fixture events.ts is parquet TIMESTAMP(NANOS); see sources.catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # reference resource envelope: 8g driver/executor
        # (scripts/02_label_engineering.py:27-28, BASELINE.md) — only
        # takes effect when this factory launches the JVM; a hostile
        # pre-built session keeps its own sizing
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
