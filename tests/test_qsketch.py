"""Mergeable quantile sketch: rank-error bound + merge invariants.

The sketch (operators/qsketch.py) promises rank error <= n/K from
equal-weight compression: each centroid covers <= ceil(n/K)
consecutive ranks, interpolation at weight midpoints lands within one
centroid of the true rank. Verified against exact percentile() on the
events fixture, per group — the same data the registered drift twin
pair (mlops_quantile_drift / _sketch) reads.
"""

import bisect

import pytest
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.operators.qsketch import (
    sketch_quantiles,
)
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load


def test_sketch_rank_error_bound(spark, sf_smoke):
    ev = load(spark, sf_smoke, "events").select("event_type", "value")
    k = 64
    est = {
        r["g"]: (r["q500"], r["q950"], r["n"])
        for r in sketch_quantiles(
            ev, "event_type", "value", probs=(0.5, 0.95), k=k
        ).collect()
    }
    assert est
    for g, (q50, q95, n_est) in est.items():
        vals = sorted(
            r["value"]
            for r in ev.filter(
                (F.col("event_type") == g) & F.col("value").isNotNull()
            ).collect()
        )
        n = len(vals)
        assert n_est == pytest.approx(n)
        for p, q in ((0.5, q50), (0.95, q95)):
            # rank of the estimate among the exact sorted values
            lo = bisect.bisect_left(vals, q)
            hi = bisect.bisect_right(vals, q)
            target = p * (n - 1)
            # interpolated estimates may fall between two values;
            # nearest covered rank must be within n/k + 1 of target
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / k + 1, (g, p, q, err, n)


def test_sketch_merge_is_order_insensitive(spark, sf_smoke):
    """Same data, different shard counts -> estimates within the same
    rank-error envelope of each other (merge associativity in
    practice: partials never see whole groups yet agree)."""
    ev = load(spark, sf_smoke, "events").select("event_type", "value")
    a = {
        r["g"]: r["q500"]
        for r in sketch_quantiles(
            ev, "event_type", "value", probs=(0.5,), k=64, n_shards=4
        ).collect()
    }
    b = {
        r["g"]: r["q500"]
        for r in sketch_quantiles(
            ev, "event_type", "value", probs=(0.5,), k=64, n_shards=32
        ).collect()
    }
    assert set(a) == set(b)
    for g in a:
        exact = (
            ev.filter(F.col("event_type") == g)
            .agg(F.expr("percentile(value, 0.5)"))
            .first()[0]
        )
        spread = abs(a[g] - b[g])
        scale = max(abs(exact), 1.0)
        assert spread <= 0.1 * scale, (g, a[g], b[g], exact)


def test_sketch_rerun_deterministic(spark, sf_smoke):
    ev = load(spark, sf_smoke, "events").select("event_type", "value")
    r1 = sorted(
        map(tuple, sketch_quantiles(
            ev, "event_type", "value", probs=(0.5, 0.95)
        ).collect())
    )
    r2 = sorted(
        map(tuple, sketch_quantiles(
            ev, "event_type", "value", probs=(0.5, 0.95)
        ).collect())
    )
    assert r1 == r2
