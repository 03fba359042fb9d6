"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column-name set, and an
order-insensitive value multiset (columns sorted by name, floats
canonicalized). Mirrors the CORRECTNESS_r{N}.json gate so every
operator is verified before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

from big_data_backblaze_hard_drive_failure_spark.sources.catalog import TABLES

_FLOAT_DECIMALS = 6


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, _FLOAT_DECIMALS)
        return 0.0 if r == 0 else r
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _multiset(rows, cols_sorted, col_index):
    out = []
    for row in rows:
        out.append(tuple(_canon(row[col_index[c]]) for c in cols_sorted))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # synthetic-fixture dirs (boundary tests) carry only the tables
        # they exercise; a query referencing a missing one fails loudly
        if not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    rel = con.sql(sql)
    # The driver fetches oracle results via .df(); DuckDB HUGEINT
    # (e.g. an uncast SUM over BIGINT) silently becomes float64 there
    # and hash-mismatches Spark's int64 — reject it at the source.
    hug = [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not hug, (
        f"oracle outputs HUGEINT column(s) {hug}: wrap with "
        "CAST(... AS BIGINT) so the driver's pandas fetch stays integral"
    )
    cols = list(rel.columns)
    rows = rel.fetchall()
    con.close()
    return cols, rows


def compare(spark, sf_dir: str, fn, sql: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_oracle(sf_dir, sql)

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cols_sorted = sorted(s_cols)
    s_ms = _multiset(s_rows, cols_sorted, {c: i for i, c in enumerate(s_cols)})
    d_ms = _multiset(d_rows, cols_sorted, {c: i for i, c in enumerate(d_cols)})
    if s_ms != d_ms:
        diffs = [
            (a, b) for a, b in zip(s_ms, d_ms) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s_ms, d_ms) if a != b)} rows); "
            f"first diffs (spark, duckdb): {diffs}"
        )
