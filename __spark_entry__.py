"""Driver contract for the spark-graft builder (PySpark target).

Wires the driver's verify harness to the engine's query registry
(``big_data_backblaze_hard_drive_failure_spark.plans``): ``entry`` runs the
flagship rolling-feature query at sf0.001; ``queries`` /
``oracle_sql`` expose every oracle-checked operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's analytical core (lead label +
    rolling features) in one DAG over events at sf0.001."""
    return QUERIES["ref_rolling_features"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
