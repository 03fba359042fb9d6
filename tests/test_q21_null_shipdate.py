"""q21 NULL-shipdate semantics as a THEOREM, not a comment (round-13,
verdict r12 ask #7's marginal-spend item).

The round-12 roster rewrite replaced q21's EXISTS / NOT-EXISTS fact
self-joins with map-side array predicates over a per-order
collect_list. The subtle contract is three-valued logic at two spots:

  * ``F.exists(arr, pred)`` returns NULL — not false — when no
    element satisfies the predicate but at least one evaluation is
    NULL (an l3 row with NULL l_shipdate). The old anti-join treated
    a NULL condition as "no match" (the row SURVIVES NOT EXISTS), so
    the rewrite pins ``coalesce(exists(...), false)``. Dropping the
    coalesce silently drops every l1 row whose order has a
    NULL-shipdate sibling.
  * a NULL l_shipdate row itself never enters l1 (``NULL >
    o_orderdate + 30`` is NULL → filtered), but it DOES appear in the
    per-order roster as an l2/l3 candidate.

This corpus makes each path load-bearing with known-by-hand expected
output, then cross-checks the registered DuckDB oracle on the same
files — both the engine-vs-oracle MATCH and the absolute answer are
asserted, so a matching-but-wrong drift on BOTH sides would still
fail.

Corpus (all orders status F, orderdate 1995-01-01, shipdates +60d
where non-NULL so the l1 ``> orderdate + 30 day`` filter passes):

  order 0: supplier 0 ships (real date), supplier 1 NULL shipdate.
           -> supplier 0's l1 row: EXISTS other (yes, sk differs) AND
              NOT EXISTS later (the only candidate comparison is
              NULL -> no match -> survives). COUNTED: the coalesce
              path, the row that disappears without it.
  order 1: both lineitems NULL shipdate -> l1 empty for this order.
  order 2: supplier 0 ships day 60, supplier 1 ships day 70 (later,
           real) -> supplier 0 excluded by NOT EXISTS, supplier 1
           survives (nobody later). Control: three-valued logic off.
  order 3: single lineitem (supplier 0) -> EXISTS other fails.

Expected: supplier 0 waits once (order 0), supplier 1 once (order 2).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES
from tests.oracle import compare

SRC = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_ODATE = dt.datetime(1995, 1, 1)
_SHIP = _ODATE + dt.timedelta(days=60)
_LATER = _ODATE + dt.timedelta(days=70)

# (l_orderkey, l_partkey, l_suppkey, l_linenumber, qty, price, disc,
#  tax, rf, ls, l_shipdate)
_LINEITEMS = [
    (0, 0, 0, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", _SHIP),
    (0, 0, 1, 2, 1.0, 100.00, 0.0, 0.0, "N", "O", None),
    (1, 0, 0, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", None),
    (1, 0, 1, 2, 1.0, 100.00, 0.0, 0.0, "N", "O", None),
    (2, 0, 0, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", _SHIP),
    (2, 0, 1, 2, 1.0, 100.00, 0.0, 0.0, "N", "O", _LATER),
    (3, 0, 0, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", _SHIP),
]
_ORDERS = [
    (k, 0, "F", 100.00, _ODATE, "1-URGENT") for k in range(4)
]
_SUPPLIERS = [
    (0, "Supplier#000000000", 0, 0.00),
    (1, "Supplier#000000001", 0, 0.00),
]


@pytest.fixture(scope="module")
def null_shipdate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_q21_nullship")
    for t, rows in (
        ("supplier", _SUPPLIERS),
        ("orders", _ORDERS),
        ("lineitem", _LINEITEMS),
    ):
        schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        schema = pa.schema([schema.field(i) for i in range(len(schema))])
        cols = list(zip(*rows))
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                schema=schema,
            ),
            str(d / f"{t}.parquet"),
        )
    return str(d)


def test_q21_null_shipdate_expected_by_hand(spark, null_shipdate_dir):
    """The engine's absolute answer on the hand corpus — each
    supplier waits exactly once, via a DIFFERENT three-valued path."""
    rows = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["tpch_q21_waiting_suppliers"](
            spark, null_shipdate_dir
        ).collect()
    }
    assert rows == {
        "Supplier#000000000": 1,  # order 0: NULL-sibling coalesce path
        "Supplier#000000001": 1,  # order 2: plain no-one-later path
    }, rows


def test_q21_null_shipdate_matches_oracle(spark, null_shipdate_dir):
    """And the registered oracle agrees on the same files (the driver
    gate's exact comparison)."""
    compare(
        spark,
        null_shipdate_dir,
        QUERIES["tpch_q21_waiting_suppliers"],
        ORACLE["tpch_q21_waiting_suppliers"],
    )


def test_q21_coalesce_is_load_bearing(spark, null_shipdate_dir):
    """The anti-regression half: rebuild the rewrite's predicate
    WITHOUT the coalesce and show it drops supplier 0's order-0 row —
    i.e. the corpus genuinely exercises the NULL path (a theorem
    about the corpus, so a future refactor can't neuter the two
    tests above by accident)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    li = load(spark, null_shipdate_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load(spark, null_shipdate_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l1 = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_suppkey").alias("sk"),
                F.col("l_shipdate").alias("sd"),
            )
        ).alias("lis")
    )
    j = l1.join(per_order, "l_orderkey")
    others = F.filter("lis", lambda x: x["sk"] != F.col("l_suppkey"))
    later_raw = F.exists(others, lambda x: x["sd"] > F.col("l_shipdate"))
    no_coalesce = (
        j.filter((F.size(others) > 0) & ~later_raw)
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    # without coalesce, ~NULL is NULL -> filter drops order 0's row;
    # only order 2's supplier-1 row (all-real comparisons) survives
    assert [(r["l_orderkey"], r["l_suppkey"]) for r in no_coalesce] == [
        (2, 1)
    ], no_coalesce
