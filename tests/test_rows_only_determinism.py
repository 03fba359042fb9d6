"""Twice-run value identity for the rows-only queries.

The 13 queries without a DuckDB oracle get only the driver's weak
check (row counts). But every one of them is DESIGNED deterministic —
seeded rand()/sampleBy, seeded MLlib fits, deterministic sketches —
so the missing hard signal is rerun identity: build and execute each
query twice in the same session and require identical canonicalized
values. Catches unseeded randomness, race-for-first-row picks, and
unstable tie-breaks — the failure modes an oracle would have caught.

The ANN fit memos are cleared between runs so the second pass
re-exercises the FIT path (seeded hyperplanes / Lloyd iterations),
not just the cached model.
"""

from __future__ import annotations

import os

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES
from tests.oracle import _canon

SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _clear_fit_memos():
    from big_data_backblaze_hard_drive_failure_spark.plans import datapipe

    datapipe._BRP_LSH_MODELS.clear()
    datapipe._IVF_CENTROIDS.clear()


def _snapshot(spark, name):
    df = QUERIES[name](spark, SF)
    return sorted(
        (tuple(_canon(v) for v in row) for row in df.collect()), key=repr
    )


def test_rows_only_queries_are_rerun_identical(spark):
    names = sorted(n for n in QUERIES if n not in ORACLE)
    assert names, "registry should have rows-only queries"
    bad = {}
    for name in names:
        _clear_fit_memos()
        first = _snapshot(spark, name)
        _clear_fit_memos()
        second = _snapshot(spark, name)
        if first != second:
            diff = sum(1 for a, b in zip(first, second) if a != b)
            bad[name] = (
                f"{len(first)} vs {len(second)} rows, {diff} differing"
            )
    assert not bad, f"nondeterministic rows-only queries: {bad}"
