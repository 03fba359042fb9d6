"""Driver simulation — consumes __spark_entry__ exactly as the driver's
verify harness does, under a deliberately hostile (vanilla, non-UTC)
SparkSession. Run: ``python scripts/driver_sim.py [sf_dir]``.

Checks: entry() smoke at sf0.001; every queries() entry vs its
oracle_sql() in DuckDB (column names, row count, order-insensitive
canonicalized values). Exit 0 = all match.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
from pyspark.sql import SparkSession

# `python scripts/driver_sim.py` puts scripts/ (not the repo root) on
# sys.path; __spark_entry__ and the package live at the root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    # identical canonicalization to the pytest gate (tests/oracle.py
    # _canon): NaN -> sentinel, -0.0 -> 0.0, so the two harnesses
    # can't disagree on edge floats
    try:
        from tests.oracle import _canon

        return _canon(v)
    except ImportError:
        if isinstance(v, float):
            import math

            if math.isnan(v):
                return "NaN"
            r = round(v, 6)
            return 0.0 if r == 0 else r
        if isinstance(v, dt.datetime):
            return v.replace(tzinfo=None).isoformat()
        if isinstance(v, dt.date):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return v


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only=") :].split(","))
        elif a == "--first50":
            # replicate the driver's budget: the first 50 entries in
            # registry iteration order (the rotation floats unseen
            # names to the front)
            only = "FIRST50"  # resolved after import
        elif a.startswith("--"):
            # an unrecognized flag must not silently select all 248
            # queries (or zero) and print a green run
            raise SystemExit(f"unknown flag {a!r} (expected --only=a,b or --first50)")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        # hostile on purpose: the driver does NOT use our session factory
        .config("spark.sql.session.timeZone", "America/Los_Angeles")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    n = e.entry(spark).count()
    print(f"entry() rows: {n}")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    if only == "FIRST50":
        # Replicate the real driver's budget: the first 50 entries in
        # registry iteration order, executed IN that order (sorted()
        # here would change the run order vs the driver and make
        # timing/ordering artifacts non-reproducible).
        names = list(qs)[:50]
        only = None
    else:
        names = sorted(qs) if only is None else sorted(n for n in qs if n in only)
    if only is not None:
        unknown = sorted(only - set(qs))
        if unknown:
            # a typo'd --only name must fail loudly, not shrink the run
            raise SystemExit(f"--only names not in the registry: {unknown}")
    if not names:
        raise SystemExit("no queries selected — refusing to print a green run")
    fails = []
    for name in names:
        # one query crashing (e.g. an ANSI overflow the small-sf gate
        # can't see) must not mask the rest of the run: record the
        # error like the real driver does and keep going
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            print(f"{name}: ERROR ({type(e).__name__}: {msg})")
            fails.append(name)
            continue
        if name not in osql:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        try:
            cur = con.execute(osql[name])
        except Exception as e:  # noqa: BLE001 - e.g. DuckDB overflow abort
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            print(f"{name}: ORACLE-ERROR ({type(e).__name__}: {msg})")
            fails.append(name)
            continue
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        scols = sdf.columns
        cs = sorted(scols)
        si = {c: i for i, c in enumerate(scols)}
        di = {c: i for i, c in enumerate(dcols)}
        ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
        if ok:
            sm = sorted((tuple(canon(r[si[c]]) for c in cs) for r in srows), key=repr)
            dm = sorted((tuple(canon(r[di[c]]) for c in cs) for r in drows), key=repr)
            ok = sm == dm
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            fails.append(name)
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
