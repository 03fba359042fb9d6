"""Round-10 sf10 decade for the SHUFFLE-JOIN-bound family (verdict
ask #4): datapipe_unigram_logprob is the documented linear profile
whose cost is a token-stream x vocab shuffle join, not a per-row hash
map. The hash-bound family (LSH) got its fifth decade in round 9 and
a fixed-plus-linear decomposition; this script measures whether the
same mechanics (split-width engages cores, fixed overhead amortizes)
generalize to the join-bound profile.

Variants (interleaved within one session, min-of-3, all noop sink):
  tok     = tokenize/explode alone — the shared map cost
  vocab   = tokenize + freq groupBy — adds the O(vocab) shuffle
  full    = the registered query, cache cleared per rep (tokenize x2
            through the staged freq + total + scoring join + doc agg
            + top-20)
  join    = scoring join + doc agg over PRE-STAGED toks and freq —
            the join-shuffle cost alone (measured last, cache scoped)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.session import get_spark
from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import tokens
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
    release_stage_boundaries,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    (os.path.join(ROOT, "_scratch", "sf1"), "sf1"),
    (os.path.join(ROOT, "_scratch", "sf10"), "sf10"),
]

spark = get_spark(app_name="unigram_ab")
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def toks_frame(d):
    return load(spark, d, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )


REPS = 3
best = {}

# warm both SFs (page cache + codegen), nothing persisted afterwards
for d, tag in SFS:
    noop(QUERIES["datapipe_unigram_logprob"](spark, d))
    release_stage_boundaries()
    spark.catalog.clearCache()

# Phase 1: uncached variants, interleaved
for rep in range(REPS):
    for v, build in (
        ("tok", toks_frame),
        (
            "vocab",
            lambda d: toks_frame(d)
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("freq")),
        ),
        ("full", lambda d: QUERIES["datapipe_unigram_logprob"](spark, d)),
    ):
        for d, tag in SFS:
            t = timeit(lambda: noop(build(d)))
            best[(v, tag)] = min(best.get((v, tag), float("inf")), t)
            # the registered query stages freq internally — clear so
            # every 'full' rep pays the real cache build, and no
            # fragment leaks into the other variants' plans
            release_stage_boundaries()
            spark.catalog.clearCache()

# Phase 2: scoring join + doc agg over staged inputs
staged = {}
for d, tag in SFS:
    tk = toks_frame(d).persist()
    tk.count()
    fr = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("freq")).persist()
    fr.count()
    staged[tag] = (tk, fr)
for rep in range(REPS):
    for d, tag in SFS:
        tk, fr = staged[tag]
        tot = fr.agg(F.sum("freq").alias("t"))

        def scoring():
            noop(
                tk.join(fr, "tok")
                .crossJoin(F.broadcast(tot))
                .groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_tokens"),
                    F.round(
                        F.avg(F.log(F.col("freq") * 1.0 / F.col("t"))), 6
                    ).alias("avg_logprob"),
                )
                .orderBy("avg_logprob", "doc_id")
                .limit(20)
            )

        t = timeit(scoring)
        best[("join", tag)] = min(best.get(("join", tag), float("inf")), t)
for tk, fr in staged.values():
    tk.unpersist()
    fr.unpersist()

print("\n| variant | sf1 | sf10 | x |")
print("|---|---|---|---|")
for v in ("tok", "vocab", "full", "join"):
    a = best[(v, "sf1")]
    b = best[(v, "sf10")]
    print(f"| {v} | {a:.2f}s | {b:.2f}s | {b / a:.1f}x |")
