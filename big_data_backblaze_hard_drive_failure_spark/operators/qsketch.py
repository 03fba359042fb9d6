"""Mergeable quantile sketch (t-digest-style weighted centroids).

The scale path for quantiles next to exact ``percentile()``: exact
percentile holds every group's values in sorted per-group state —
fine until one group is 10^10 rows. A mergeable sketch caps state at
K weighted centroids per partial, merges associatively, and answers
any quantile afterwards with bounded rank error (<= n/K by
construction: each centroid covers at most ceil(n/K) consecutive
ranks, so interpolating at centroid midpoints lands within one
centroid's weight of the true rank).

Spark shape — the canonical two-level mergeable aggregate:

  1. shard the group ROWS by a hash (``n_shards`` partials per
     group), compress each shard to <= K centroids with one
     ``applyInPandas`` (Arrow-batched, never row-pickled);
  2. merge each group's partial centroids with a second
     ``applyInPandas`` — re-compress the union to K and interpolate
     the requested quantiles from cumulative centroid weights.

Both levels are deterministic: values are sorted and bucketed by
position, so equal inputs give identical centroids regardless of
arrival order (the rows-only rerun-determinism sweep relies on it).

This is the same compress/merge contract KLL and t-digest implement
(Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", 2019) with the simplest correct compressor: equal-weight
rank bands rather than the quantile-biased t-digest scale function —
rank error is uniform instead of edge-tight, which the error-bound
test pins.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _compress(values: np.ndarray, weights: np.ndarray, k: int):
    """Sort (value, weight) pairs and re-bucket into <= k centroids of
    near-equal weight. Returns (means, weights) arrays.

    The sort key is the TOTAL order (value, weight) — np.lexsort's
    last key is primary — not value alone: two centroids with equal
    mean but different weights (distinct shard value sets averaging
    to the same mean) would otherwise keep their nondeterministic
    shuffle arrival order, shifting band edges between reruns and
    breaking the determinism the rerun sweep pins."""
    order = np.lexsort((weights, values))
    v = values[order]
    w = weights[order]
    total = float(w.sum())
    if total <= 0 or len(v) == 0:
        return np.array([]), np.array([])
    if len(v) <= k:
        return v.astype(float), w.astype(float)
    # equal-weight band edges over the cumulative weight axis
    cum = np.cumsum(w)
    edges = total * (np.arange(1, k + 1) / k)
    band = np.searchsorted(edges, cum - 1e-9 * total, side="left")
    band = np.minimum(band, k - 1)
    means = np.zeros(k)
    wsum = np.zeros(k)
    np.add.at(wsum, band, w)
    np.add.at(means, band, v * w)
    keep = wsum > 0
    return means[keep] / wsum[keep], wsum[keep]


def _quantile_from_centroids(
    means: np.ndarray, weights: np.ndarray, p: float
) -> float:
    """Interpolate quantile p from weighted centroids at their
    cumulative-weight midpoints (the standard t-digest estimator)."""
    total = weights.sum()
    if total <= 0:
        return float("nan")
    cum = np.cumsum(weights) - weights / 2.0
    target = p * total
    return float(np.interp(target, cum, means))


def sketch_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float],
    k: int = 64,
    n_shards: int = 32,
    shard_key: str | None = None,
) -> DataFrame:
    """Distributed mergeable-quantile aggregate: per ``group_col``
    group, estimate ``probs`` quantiles of ``value_col`` through
    compress-then-merge centroids. ``shard_key`` (default: the value
    itself) spreads each group over ``n_shards`` partials so no
    single task ever sees a whole group."""
    key = F.col(shard_key) if shard_key else F.col(value_col)
    shards = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.pmod(F.hash(key), F.lit(n_shards)).alias("shard"),
    ).filter(F.col("v").isNotNull())
    # group column keeps its INPUT type through the sketch — hardcoding
    # "g string" silently miscast int/date group keys
    g_type = shards.schema["g"].dataType

    def compress_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress(
            pdf["v"].to_numpy(float),
            np.ones(len(pdf)),
            k,
        )
        return pd.DataFrame(
            {"g": pdf["g"].iloc[0], "mean": m, "weight": w}
        )

    partial_schema = T.StructType(
        [
            T.StructField("g", g_type),
            T.StructField("mean", T.DoubleType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )
    partials = shards.groupBy("g", "shard").applyInPandas(
        compress_shard, partial_schema
    )

    plist = list(probs)
    # permille naming (q500, q950, q999): int(p*100) truncates AND
    # collides — 0.999 and 0.99 both mapped to q99, int(0.29*100)==28
    qcols = [_qcol(p) for p in plist]
    if len(set(qcols)) != len(qcols):
        raise ValueError(f"probs collide at permille precision: {plist}")

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress(
            pdf["mean"].to_numpy(float), pdf["weight"].to_numpy(float), k
        )
        row = {"g": pdf["g"].iloc[0], "n": float(w.sum())}
        for p, c in zip(plist, qcols):
            row[c] = _quantile_from_centroids(m, w, p)
        return pd.DataFrame([row])

    out_schema = T.StructType(
        [T.StructField("g", g_type), T.StructField("n", T.DoubleType())]
        + [T.StructField(c, T.DoubleType()) for c in qcols]
    )
    return partials.groupBy("g").applyInPandas(merge_group, out_schema)


def _qcol(p: float) -> str:
    """Column name for quantile p at permille precision: q500, q950,
    q999. round() not int() so 0.29 -> q290, not the float-truncation
    q28x artifact."""
    return f"q{round(p * 1000)}"
