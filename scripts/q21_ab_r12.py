"""Round-12 q21 rewrite A/B: semi+anti self-joins (the retired plan,
reconstructed inline) vs the per-order collect_list rewrite (the
registered plan), interleaved in ONE session, min-of-N, at sf0.1 and
(optionally) sf1 — pass sf dirs as argv.

Usage: python scripts/q21_ab_r12.py [sf_dir ...]
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

spark = get_spark(app_name="q21_ab_r12")
spark.sparkContext.setLogLevel("ERROR")


def old_plan(sf_dir):
    """The retired round-11 plan: left-semi + left-anti lineitem
    self-joins (lineitem scanned 3x, shuffled 3x)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l1 = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .alias("l1")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.alias("l3")
    other = (F.col("l1.l_orderkey") == F.col("l2.l_orderkey")) & (
        F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    )
    later = (
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(l2, other, "left_semi")
        .join(l3, later, "left_anti")
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


VARIANTS = {
    "old_semi_anti": old_plan,
    "new_roster": lambda d: QUERIES["tpch_q21_waiting_suppliers"](spark, d),
}

# output-identity check first, then warm both, then interleave
for d in SFS:
    a = sorted(map(tuple, VARIANTS["old_semi_anti"](d).collect()))
    b = sorted(map(tuple, VARIANTS["new_roster"](d).collect()))
    print(f"{d}: outputs identical = {a == b} ({len(a)} rows)")

best: dict[tuple, float] = {}
for rep in range(REPS):
    for v, build in VARIANTS.items():
        for d in SFS:
            t0 = time.perf_counter()
            noop(build(d))
            t = time.perf_counter() - t0
            key = (v, d)
            best[key] = min(best.get(key, float("inf")), t)
            print(f"rep{rep} {v} {os.path.basename(d)}: {t:.3f}s")

print("---- minima ----")
for (v, d), t in sorted(best.items()):
    print(f"{v} {os.path.basename(d)}: {t:.3f}")
