"""sf1 subset-oracle parity for ``datapipe_jaccard_prefix_join``
(round-12, verdict ask #5).

The full brute-force oracle at sf1 is infeasible (50k docs -> 1.25e9
pairs), so the sf1 ledger carried this one name engine-run-only. A
deterministic doc_id-stratified subsample closes the gap: filter the
sf1 documents table to ``doc_id % 10 = 0`` (5k docs -> 12.5M oracle
pairs, DuckDB-feasible), materialize it as its own fixture dir, and
run BOTH engines on that subset — the registered Spark query
unmodified (it reads ``{sf_dir}/documents.parquet``) and the
registered oracle SQL over the same file. PPJoin's prefix-filter
guarantee is per-pair, so correctness on a doc-stratified subset
exercises the identical plan (rarity ordering, prefix explode,
candidate join, verify joins) at a scale the full oracle can't reach.

Comparison is the driver's: column names, row count,
order-insensitive canonicalized values (canon imported from
driver_sim). Prints one MATCH/MISMATCH line for the parity log.

Usage: python scripts/jaccard_sf1_subset_parity.py [sf1_dir]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import duckdb  # noqa: E402

from driver_sim import canon  # noqa: E402

NAME = "datapipe_jaccard_prefix_join"


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "_scratch", "sf1"
    )
    sub_dir = os.path.join(_REPO, "_scratch", "sf1_jaccard_subset")
    os.makedirs(sub_dir, exist_ok=True)
    sub_docs = os.path.join(sub_dir, "documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM read_parquet('{sf1}/documents.parquet')
              WHERE doc_id % 10 = 0)
        TO '{sub_docs}' (FORMAT PARQUET)
        """
    )
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{sub_docs}')"
    ).fetchone()[0]
    print(f"subset fixture: {n_docs} docs (doc_id % 10 = 0) at {sub_dir}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        # same hostile session + 8g envelope as the sf1 ledger runs
        .config("spark.sql.session.timeZone", "America/Los_Angeles")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from big_data_backblaze_hard_drive_failure_spark.plans import (
        ORACLE,
        QUERIES,
    )

    sdf = QUERIES[NAME](spark, sub_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    print(f"spark rows: {len(srows)}")

    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sub_docs}')"
    )
    cur = con.execute(ORACLE[NAME])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    print(f"oracle rows: {len(drows)}")

    cs = sorted(scols)
    si = {c: i for i, c in enumerate(scols)}
    di = {c: i for i, c in enumerate(dcols)}
    ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
    if ok:
        sm = sorted(
            (tuple(canon(r[si[c]]) for c in cs) for r in srows), key=repr
        )
        dm = sorted(
            (tuple(canon(r[di[c]]) for c in cs) for r in drows), key=repr
        )
        ok = sm == dm
    print(
        f"{NAME}: "
        + ("MATCH" if ok else "MISMATCH")
        + f" ({len(srows)} rows, subset-oracle doc_id%10=0 at sf1)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
