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
    with accumulation order). NULLs are skipped like SQL AVG; an
    all-NULL group aggregates to NULL."""
    cents = (v.dropna() * 100).round().astype("int64")
    if cents.empty:
        return None
    return int(cents.sum()) / (len(cents) * 100.0)


# Scalar Arrow UDFs (Spark 4 arrow_udf) — live here for the same
# PEP-563 reason as the pandas_udf above: arrow_udf dispatches on the
# REAL pa.Array type hints.
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql.functions import arrow_udf


@arrow_udf("long")
def arrow_n_tokens(text: pa.Array) -> pa.Array:
    """Whitespace token count, computed by pyarrow C++ kernels."""
    return pc.cast(
        pc.list_value_length(pc.split_pattern(text, pattern=" ")),
        pa.int64(),
    )


@arrow_udf("long")
def arrow_n_chars(text: pa.Array) -> pa.Array:
    """UTF-8 codepoint count (== DuckDB len())."""
    return pc.cast(pc.utf8_length(text), pa.int64())
