"""Every oracle-paired query in the registry must hash-match DuckDB at
sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_oracle, name):
    compare(spark, sf_oracle, QUERIES[name], ORACLE[name])


@pytest.mark.slow
def test_every_query_runs(spark, sf_smoke):
    """Every registered query (including rows-only ones) must execute;
    queries over known-populated fixtures must return rows.

    Marked slow (round 14, ~144s): in the DEFAULT run the same ground
    is covered by the per-query oracle-parity params above (all
    oracle-paired queries execute) plus test_rows_only_determinism
    (every rows-only query executes, twice), and the external driver's
    own correctness harness runs all 282 regardless — so skipping this
    sweep in the verify-window run loses no unique signal."""
    may_be_empty = {"star_anti_join", "datapipe_neardup_pairs"}
    for name, fn in QUERIES.items():
        n = fn(spark, sf_smoke).count()
        if name not in may_be_empty:
            assert n > 0, f"{name} returned no rows at sf0.001"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
