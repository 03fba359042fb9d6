"""Custom aggregates via pandas_udf GROUPED_AGG.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF kind from REAL type hints (``pd.Series -> float``),
which PEP-563 stringification breaks.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def exact_cents_mean(v: pd.Series) -> float:
    """Exact mean of a 2-decimal column via integer cents: summing
    int64 is order-insensitive, so the result is bit-identical across
    partial-aggregation layouts AND engines (a float sum would drift
    with accumulation order)."""
    cents = (v * 100).round().astype("int64")
    return int(cents.sum()) / (len(v) * 100.0)
