"""Property-based tests (hypothesis): operator semantics verified
against plain-Python reference implementations on generated data —
coverage the fixture-based oracle can't give (degenerate groups,
ties, single-element entities, empty inputs).

Settings: few examples with reuse of one SparkSession; each example
is a tiny local DataFrame, so the suite stays fast.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.operators.labeling import (
    lead_label,
)
from big_data_backblaze_hard_drive_failure_spark.operators.topk import (
    top_k_per_group,
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # group
        st.integers(min_value=0, max_value=50),  # value
        st.integers(min_value=0, max_value=99),  # unique-ish id
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[2],
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=_rows, k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_top_k_per_group_property(spark, rows, k):
    df = spark.createDataFrame(rows, "g INT, v INT, id INT")
    got = {
        (r["g"], r["id"])
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id")], k=k
        ).collect()
    }
    groups = defaultdict(list)
    for g, v, i in rows:
        groups[g].append((-v, i))
    want = {
        (g, i)
        for g, vals in groups.items()
        for (_, i) in sorted(vals)[:k]
    }
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_lead_label_property(spark, rows):
    """Label is 1 iff the entity's NEXT row (by (v, id) order) has
    flag 1; last row per entity is always 0."""
    data = [(g, v, i, i % 2) for g, v, i in rows]
    df = spark.createDataFrame(data, "g INT, v INT, id INT, flag INT")
    got = {
        r["id"]: r["failure_next_24h"]
        for r in lead_label(df, "g", ["v", "id"], "flag").collect()
    }
    groups = defaultdict(list)
    for g, v, i, f in data:
        groups[g].append((v, i, f))
    want = {}
    for g, vals in groups.items():
        vals.sort()
        for idx, (_, i, _f) in enumerate(vals):
            nxt = vals[idx + 1][2] if idx + 1 < len(vals) else 0
            want[i] = 1 if nxt == 1 else 0
    assert got == want
