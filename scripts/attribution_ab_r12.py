"""Round-12 attribution-rewrite A/B: the retired (purchase x click)
interval self-join vs the registered range-frame window plan, for
star_touch_attribution and star_conversion_latency. Interleaved in one
session, min-of-N.

Usage: python scripts/attribution_ab_r12.py [sf_dir ...]
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.session import get_spark  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load  # noqa: E402

SFS = sys.argv[1:] or ["/root/testdata/sf0.1"]
REPS = 6

spark = get_spark(app_name="attribution_ab_r12")
spark.sparkContext.setLogLevel("ERROR")


def _pairs(sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    return p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOUR")),
    )


def old_touch(sf_dir):
    key = F.struct(F.col("cts"), F.col("click_id"))
    return _pairs(sf_dir).groupBy("purchase_id").agg(
        F.min(key).getField("click_id").cast("long").alias("first_touch_click"),
        F.max(key).getField("click_id").cast("long").alias("last_touch_click"),
        F.count(F.lit(1)).alias("n_candidate_clicks"),
    )


def old_latency(sf_dir):
    pairs = (
        _pairs(sf_dir)
        .groupBy("purchase_id")
        .agg(
            F.max(F.struct(F.col("cts"), F.col("click_id")))
            .getField("cts")
            .alias("last_ts"),
            F.first("pts").alias("pts"),
        )
    )
    delays = pairs.select(
        (
            F.unix_micros(F.col("pts").cast("timestamp"))
            - F.unix_micros(F.col("last_ts").cast("timestamp"))
        ).alias("delay_us")
    )
    return delays.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.expr("percentile(delay_us, 0.5)").alias("p50_us"),
        F.expr("percentile(delay_us, 0.9)").alias("p90_us"),
        F.max("delay_us").alias("max_us"),
    )


VARIANTS = {
    "old_touch_join": old_touch,
    "new_touch_window": lambda d: QUERIES["star_touch_attribution"](spark, d),
    "old_latency_join": old_latency,
    "new_latency_window": lambda d: QUERIES["star_conversion_latency"](spark, d),
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for d in SFS:  # identity + warm
    a = sorted(map(tuple, VARIANTS["old_touch_join"](d).collect()))
    b = sorted(map(tuple, VARIANTS["new_touch_window"](d).collect()))
    print(f"{d}: touch outputs identical = {a == b} ({len(a)} rows)")

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
