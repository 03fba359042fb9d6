"""Generate an sf1 fixture decade (10x sf0.1) for scale-curve runs.

The driver only ships sf0.001/0.01/0.1; the scale curve wants one
more decade for the heaviest families (near-dup over documents,
prefix-sum rank statistics over orders/events). sf1 is built by
10x key-shifted replication of sf0.1 into the git-ignored
``_scratch/sf1``: every copy offsets its keys (doc_id, event_id,
user_id, order/cust keys) so group/join cardinalities scale with the
data, and each document copy gets a copy-tag token appended so text
content is distinct across copies (otherwise every doc gains 9 exact
twins and the near-dup workload degenerates into one giant cluster —
duplicate STRUCTURE should stay at its organic sf0.1 rate).

Run: python scripts/gen_sf1.py   (idempotent; ~170 MB)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_scratch", "sf1")
N_COPIES = 10

# key columns to offset per copy, per table; offsets are computed
# ONCE PER KEY DOMAIN from the domain's PRIMARY table (customer for
# custkeys, orders for orderkeys, documents for doc ids), then used
# on BOTH sides of each FK. A per-table max(key)+1 only preserves
# referential integrity when the referencing side happens to reach
# the referenced max (true of the current fixture, by luck) —
# domain-shared offsets make copy-i joins correct for any fixture.
# embeddings.vec_id lives in the doc_id domain (the semantic-dedup
# queries join vec_id = doc_id), so it shifts by the documents
# offset, not its own subset's max.
PLANS = {
    "documents": {"keys": {"doc_id": "docid"}, "tag_text": True},
    "events": {"keys": {"event_id": "eventid", "user_id": "userid"}},
    "orders": {"keys": {"o_orderkey": "orderkey", "o_custkey": "custkey"}},
    "customer": {"keys": {"c_custkey": "custkey"}},
    "lineitem": {"keys": {"l_orderkey": "orderkey"}},
    "embeddings": {"keys": {"vec_id": "docid"}},
}

# domain -> (primary table, primary key column)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "docid": ("documents", "doc_id"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    domain_offs = {
        d: con.execute(
            f"SELECT MAX({pk}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for d, (t, pk) in DOMAINS.items()
    }
    for table, plan in PLANS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        offs = {k: domain_offs[d] for k, d in plan["keys"].items()}
        sel = []
        for c in cols:
            if c in offs:
                sel.append(f"({c} + cp.i * {offs[c]}) AS {c}")
            elif c == "text" and plan.get("tag_text"):
                sel.append(
                    "CASE WHEN cp.i = 0 THEN text "
                    "ELSE text || ' copytag' || CAST(cp.i AS VARCHAR) "
                    "END AS text"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}') "
            f"CROSS JOIN (SELECT unnest(range(0, {N_COPIES})) AS i) cp) "
            f"TO '{dst}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")
    # small dims pass through unscaled (queries join them by key range
    # that replication never leaves)
    for table in ("region", "nation", "supplier", "part"):
        src, dst = f"{SRC}/{table}.parquet", f"{DST}/{table}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' "
                f"(FORMAT PARQUET, COMPRESSION SNAPPY)"
            )
            print(f"{table}: copied unscaled")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
