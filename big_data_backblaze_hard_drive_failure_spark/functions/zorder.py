"""Z-order (Morton) clustering key — multi-dimensional data layout.

A single-column sort gives perfect min/max row-group pruning on that
column and NONE on any other. Interleaving the bits of several
bucketed key columns (the Morton curve) trades a little locality on
each dimension for usable locality on ALL of them: after sorting by
the interleaved key, every file/row-group spans a small hyper-cube of
the key space, so parquet footer min/max statistics prune scans for
predicates on ANY of the clustered columns. This is the layout
technique behind ``OPTIMIZE ZORDER BY`` in lakehouse table formats,
built here from plain Spark expressions.

Everything is JVM-side integer arithmetic in ONE generated SQL
expression (no UDF, whole-stage-codegen'd); the min/max normalization
pass is a single tiny aggregate, broadcast as literals.

Scale (100 TB): the z-key costs one projection; the clustered write
is one range-repartition + within-partition sort — exactly what a
plain sorted write costs. The payoff is at read time: point/range
predicates on any clustered dimension skip most row groups
(demonstrated with real parquet footers in
``tests/test_scale_layout.py::test_zorder_write_prunes_both_dims``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` bits of each (already-bucketed,
    non-negative integer) column: bit ``b`` of column ``i`` lands at
    position ``b * len(cols) + i`` of the key. Built as one SQL
    string — 2-col × 8-bit is 16 shift-and-mask terms, constant-folded
    into a single codegen'd expression."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return F.expr(" + ".join(terms))


def bucketize(col: str, lo: int, hi: int, bits: int = 8) -> Column:
    """Map an integer column with known [lo, hi] range onto
    [0, 2^bits): equal-width buckets via exact integer arithmetic
    (``div``, not double division — a double quotient can round a
    maximal value up to 2^bits, whose bit pattern the Morton key
    would read as all-zero). ``lo``/``hi`` come from a one-row
    min/max aggregate (or from table-level statistics at scale)."""
    width = max(hi - lo + 1, 1)
    return F.expr(f"(({col} - {lo}) * {1 << bits}) div {width}")


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_name: str = "_zkey"
) -> DataFrame:
    """Attach the Morton key for ``cols`` (integer columns; ranges are
    measured with one global min/max aggregate and folded in as
    literals)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    ranges = df.agg(*aggs).collect()[0]  # 1 row, 2·N ints — driver-safe
    bucketed = df
    bcols = []
    for c in cols:
        bc = f"_zb_{c}"
        bucketed = bucketed.withColumn(
            bc, bucketize(c, ranges[f"_min_{c}"], ranges[f"_max_{c}"], bits)
        )
        bcols.append(bc)
    return bucketed.withColumn(key_name, zorder_key(bcols, bits)).drop(*bcols)
