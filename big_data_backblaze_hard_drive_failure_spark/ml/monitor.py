"""Shared score-binning for the deployment monitors.

One definition of the fixed decile bin — used by the batch monitors
(plans.mlops: calibration, PSI, KS, lift/gain) and the streaming
histogram (streaming.pipeline.score_histogram_stream) — so the bin
edges, the ref/cur window split, and the stream==batch /
psi==ks==lift bin identity cannot drift apart per call site.

Fixed-width edges (not quantiles) keep every monitor a single
conditional-aggregation pass whose tail is bounded by the BIN count,
not the data; see SCALE.md "Monitoring & retrieval".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# boundary between the reference (training-era) window and the
# current serving window of the events fixture
DRIFT_SPLIT = "2024-01-15"

N_SCORE_BINS = 10


def score_decile_bin(score: Column | str) -> Column:
    """Fixed-width decile bin of a [0, 1] score: least(floor(p*10), 9).
    The LEAST guard folds the closed upper edge (p == 1.0) into the
    top bin instead of an 11th phantom bin."""
    c = F.col(score) if isinstance(score, str) else score
    return F.least(F.floor(c * N_SCORE_BINS), F.lit(N_SCORE_BINS - 1)).cast(
        "long"
    )


def drift_histogram(
    scored: DataFrame,
    split: str = DRIFT_SPLIT,
    score_col: str = "failure_probability",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-bin (n_ref, n_cur) counts of a scored BATCH frame, split at
    ``split``, densified to the full 0..N_SCORE_BINS-1 spine so bins
    empty in both windows still emit a row — without the spine, a
    degenerate scorer concentrating into few bins silently drops the
    absent bins' Laplace-smoothed PSI terms and the "total PSI = sum
    of psi_term" contract quietly understates. The spine join is a
    broadcast of N_SCORE_BINS rows. (Streaming uses the data-only
    histogram instead — a stream can't left-join a static spine after
    a complete-mode aggregate — and documents that it emits observed
    bins only.)"""
    spark = scored.sparkSession
    bins = (
        scored.select(
            score_decile_bin(score_col).alias("bin"),
            F.when(
                F.col(ts_col) < F.lit(split).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("in_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("in_ref").cast("long").alias("n_ref"),
            F.sum(1 - F.col("in_ref")).cast("long").alias("n_cur"),
        )
    )
    spine = spark.range(N_SCORE_BINS).select(F.col("id").alias("bin"))
    # broadcast the aggregated (≤ N_SCORE_BINS+1 row) side: a LEFT
    # join can only broadcast its non-preserved input
    return (
        spine.join(F.broadcast(bins), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
