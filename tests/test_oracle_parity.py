"""Every oracle-paired query in the registry must hash-match DuckDB at
sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_oracle, name):
    compare(spark, sf_oracle, QUERIES[name], ORACLE[name])


def test_every_query_runs(spark, sf_smoke):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
