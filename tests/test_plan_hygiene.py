"""Global plan-hygiene gate over the ENTIRE query registry.

test_plans.py pins specific good shapes on representative queries;
this sweep enforces the universal negatives on every registered query
at once, so no future query can silently introduce the two
scale-killers:

  * ``CartesianProduct`` — an unconditioned all-pairs join. Every
    similarity/near-dup operator must go through hash buckets or an
    explicit broadcast (broadcast nested-loop over a bounded side is
    acceptable and asserted separately per-query).
  * ``BatchEvalPython`` — the row-pickling Python UDF path. Python is
    crossed Arrow-batched only (ArrowEvalPython / mapInPandas /
    applyInPandas), never per-row.
"""

from __future__ import annotations

import pytest

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES


def _tree(spark, name, sf):
    from tests.test_plans import _formatted  # single plan-extraction impl

    return _formatted(spark, name, sf).split("\n\n")[0]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python(spark, sf_smoke, name):
    tree = _tree(spark, name, sf_smoke)
    assert "CartesianProduct" not in tree, f"{name} plans an all-pairs join"
    assert "BatchEvalPython" not in tree, f"{name} uses a row-pickling UDF"


# Per-table rescan budget. Catalyst does not materialize common
# subplans: a frame consumed by N sibling branches appears N times in
# the physical plan, and each occurrence is a full corpus pass at
# 100 TB. Shapes that legitimately reach 3-4 scans exist (NOT-EXISTS
# twins like tpch_q21 re-probe lineitem; incremental-vs-corpus dedup
# reads the corpus as both sides), so the budget is 4; anything above
# means a missing operators.staging.stage_boundary on a shared frame
# (mlops_kaplan_meier hit TWELVE events scans before its boundary;
# the sweep that found it is the scan audit this test now pins).
_RESCAN_BUDGET = 4


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_table_rescan_budget(spark, sf_smoke, name):
    import re
    from collections import Counter

    from tests.test_plans import _formatted

    plan = _formatted(spark, name, sf_smoke)
    scans = Counter(re.findall(r"file:[^\s\]]*?/(\w+)\.parquet", plan))
    worst = {t: n for t, n in scans.items() if n > _RESCAN_BUDGET}
    assert not worst, (
        f"{name} scans {worst} times in one plan — add a stage_boundary "
        "on the shared frame (each extra scan is a full corpus pass)"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_paired_schemas_are_scalar(spark, sf_smoke, name):
    """Driver-gate compatibility: the correctness harness canonicalizes
    results with a pandas sort/hash that cannot order top-level
    ArrayType/MapType cells (``TypeError: unhashable type: 'list'`` —
    the round-5 datapipe_embedding_quantize / datapipe_video_frame_decode
    driver crash). Round 7 proved the driver canonicalizes rows-only
    output too (star_approx_percentiles crashed its harness with no
    oracle attached), so EVERY registered query must emit scalar
    columns only; encode vectors as CSV strings (array_join), explode
    them, or unpack with element_at."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in QUERIES[name](spark, sf_smoke).schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} emits non-scalar top-level column(s) {bad}: the driver's "
        "pandas canonicalizer crashes on them — array_join/explode instead"
    )
