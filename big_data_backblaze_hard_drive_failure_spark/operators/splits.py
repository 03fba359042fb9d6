"""Chronological splitting and class-ratio downsampling (reference M1/M2).

Reference semantics:
  * 3-way chronological split by date literal
    (/root/reference/scripts/04_prepare_training_data.py:29-40)
  * negatives Bernoulli-sampled to ``ratio:1`` vs positives, then
    unioned back with the positives (04:44-70), seed pinned.

Scale notes: the split is three predicate scans — with data laid out
partitioned-by-date these become partition-pruned reads, not full
scans. ``sample`` is a narrow map-side op (no shuffle). The ratio
computation needs two counts; we compute both in ONE pass with a
conditional aggregation instead of the reference's two count() jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chronological_split(
    df: DataFrame, time_col: str, val_start: str, test_start: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, val, test) by ``time < val_start``,
    ``val_start <= time < test_start``, ``time >= test_start``."""
    t = F.col(time_col)
    train = df.filter(t < F.lit(val_start))
    val = df.filter((t >= F.lit(val_start)) & (t < F.lit(test_start)))
    test = df.filter(t >= F.lit(test_start))
    return train, val, test


def downsample_negatives(
    df: DataFrame,
    label: Column | str,
    ratio: float = 100.0,
    seed: int = 42,
) -> DataFrame:
    """Keep all positives; sample negatives to ``ratio`` per positive
    (reference 04:44-70). One counting pass, one sampled scan, one
    union — negatives sampling is map-side (no shuffle)."""
    lab = F.col(label) if isinstance(label, str) else label
    counts = df.agg(
        F.sum(F.when(lab == 1, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(lab == 0, 1).otherwise(0)).alias("neg"),
    ).first()
    pos_n, neg_n = counts["pos"] or 0, counts["neg"] or 0
    positives = df.filter(lab == 1)
    negatives = df.filter(lab == 0)
    if neg_n == 0 or pos_n == 0:
        return positives if neg_n == 0 else df
    fraction = min(1.0, (pos_n * ratio) / neg_n)
    return positives.unionByName(negatives.sample(fraction=fraction, seed=seed))


def deterministic_downsample_negatives(
    df: DataFrame, label: Column | str, key: str, modulus: int
) -> DataFrame:
    """Oracle-checkable variant: keep negatives where
    ``key % modulus == 0`` — deterministic across engines, unlike
    seeded Bernoulli sampling (SURVEY §2.8 note)."""
    lab = F.col(label) if isinstance(label, str) else label
    return df.filter((lab == 1) | (F.col(key) % modulus == 0))
