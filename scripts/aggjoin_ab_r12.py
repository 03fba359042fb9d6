"""Round-12 A/B for self-join sweep catches #3/#4: the retired
aggregate-join-back plans (reconstructed inline) vs the registered
window rewrites, for star_cohort_retention and
tpch_q17_small_qty_revenue. Interleaved, min-of-N.

Usage: python scripts/aggjoin_ab_r12.py [sf_dir ...]
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.plans.tpch import _cents  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.session import get_spark  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load  # noqa: E402

SFS = sys.argv[1:] or ["/root/testdata/sf0.1"]
REPS = 6

spark = get_spark(app_name="aggjoin_ab_r12")
spark.sparkContext.setLogLevel("ERROR")


def old_cohort(sf_dir):
    activity = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
        .cast("long")
        .alias("week"),
    )
    cohorts = activity.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        activity.join(cohorts.hint("shuffle_hash"), "user_id")
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .filter(F.col("week_offset") <= 8)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def old_q17(sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    return (
        li.select(
            "l_partkey", "l_quantity", _cents("l_extendedprice").alias("price_c")
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sq")
        )
        .agg(
            (F.sum("price_c") / 700.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


VARIANTS = {
    "old_cohort_join": old_cohort,
    "new_cohort_window": lambda d: QUERIES["star_cohort_retention"](spark, d),
    "old_q17_aggjoin": old_q17,
    "new_q17_window": lambda d: QUERIES["tpch_q17_small_qty_revenue"](spark, d),
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


best: dict[tuple, float] = {}
for rep in range(REPS):
    for v, build in VARIANTS.items():
        for d in SFS:
            t0 = time.perf_counter()
            noop(build(d))
            t = time.perf_counter() - t0
            key = (v, os.path.basename(d))
            best[key] = min(best.get(key, float("inf")), t)
            print(f"rep{rep} {v} {key[1]}: {t:.3f}s", flush=True)

print("---- minima ----")
for (v, d), t in sorted(best.items()):
    print(f"{v} {d}: {t:.3f}")
