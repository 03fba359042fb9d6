"""Embedding-vector expressions over ``array<float>`` columns.

Brute-force similarity math as pure JVM array expressions:
``zip_with`` multiply + sequential ``aggregate`` fold. Arrays are
widened to double FIRST (float32 -> float64 is exact), then every
add/mul happens in the same left-to-right order DuckDB's manual fold
uses — bit-identical cosines, no rounding tricks needed.

Scale path: brute force is O(|queries| x |corpus|) — correct for a
bounded query set (recommendation: broadcast the query side). For
corpus-x-corpus at 100 TB use the LSH bucketing in
plans/datapipe.py (candidates only, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (left-to-right, like a SQL SUM over
    an ordered unnest)."""
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column | str) -> Column:
    sq = F.transform(as_double_array(v), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL when either vector has zero norm: the angle is undefined,
    and under ANSI mode a bare division would abort the whole job on
    one degenerate row. DuckDB's x/0 is NULL, so SQL oracles agree
    without extra CASE arms (threshold filters then drop the pair on
    both engines)."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
