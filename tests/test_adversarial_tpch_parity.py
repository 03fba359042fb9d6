"""Oracle parity on an ADVERSARIAL star-schema corpus.

Completes the adversarial trilogy (documents/embeddings, events, and
now the TPC-H-ish star tables): all 69 oracle-paired queries whose
SQL touches only the star side replay against a corpus built to
stress JOIN COMPLETENESS and BOUNDARY/TIE semantics — customers with
no orders, orders with no lineitems, order dates landing EXACTLY on
every date literal the queries filter with (>= vs > shows only at
the boundary), discounts exactly at the 0.05/0.07 BETWEEN edges,
quantity at the <24/<25 thresholds, tied account balances across
suppliers (min-cost tie-breaks), tied retail prices, duplicate
(brand, type, size) parts, unicode names flowing through joins and
group keys, and negative/zero balances. Values stay on the 2-decimal
contract. region/nation ship unchanged (queries name them
literally).
"""

from __future__ import annotations

import datetime as dt
import os
import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# Round-14: deep-audit deck — skipped in the default run so the
# suite fits the external driver's verify window; run with
# SPARK_GRAFT_FULL_TESTS=1 in builder sessions (see conftest).
pytestmark = pytest.mark.slow

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES
from tests.oracle import compare

SRC = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
_TYPES = ["LARGE", "STANDARD", "MEDIUM", "PROMO", "ECONOMY", "SMALL"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_ADJ = ["red", "large", "new", "blue", "röt", "小さな"]
_NOUN = ["bolt", "widget", "gear", "bölt"]

# every date literal the oracles filter with, hit EXACTLY
_BOUNDARY_DATES = [
    dt.datetime(1995, 1, 1), dt.datetime(1996, 1, 1),
    dt.datetime(1996, 4, 1), dt.datetime(1996, 7, 1),
    dt.datetime(1996, 10, 1), dt.datetime(1997, 1, 1),
    dt.datetime(1998, 6, 1), dt.datetime(1998, 9, 2),
    dt.datetime(2000, 1, 1),
]


def _customers():
    rows = []
    for k in range(60):
        name = f"Çüstömer#{k} 顧客" if k % 4 == 0 else f"Customer#{k:09d}"
        # heavy balance ties + negatives + an exact zero
        bal = [1000.00, 1000.00, -846.69, 0.00, 7331.25][k % 5]
        nat = 18 if k % 6 == 0 else (19 if k % 6 == 1 else k % 25)
        rows.append((k, name, nat, bal, _SEGMENTS[k % 5]))
    return rows


def _suppliers():
    rows = []
    for k in range(10):
        # tied minimum balances across EUROPE suppliers: the min-cost
        # pick must resolve through an explicit tie-break
        bal = [537.46, 537.46, 537.46, -12.00, 0.00][k % 5]
        name = f"Süpplier#{k} ⚙" if k % 3 == 0 else f"Supplier#{k:09d}"
        nat = [18, 23, 3, 8, 13, 18, 19, 0, 7, 24][k]
        rows.append((k, name, nat, bal))
    return rows


def _parts():
    rows = []
    for k in range(80):
        name = f"{_ADJ[k % 6]} {_NOUN[k % 4]}"
        brand = f"Brand#{1 + k % 25}"
        ptype = _TYPES[k % 6]
        size = [1, 50, 24, 24, 7][k % 5]  # duplicates + extremes
        price = [900.00, 900.00, 900.10, 1.00, 2098.99][k % 5]  # ties
        rows.append((k, name, brand, ptype, size, price))
    return rows


def _orders():
    rows = []
    for k in range(300):
        cust = k % 50  # customers 50..59 never order (Q13/Q22 shape)
        if k < len(_BOUNDARY_DATES) * 6:
            date = _BOUNDARY_DATES[k % len(_BOUNDARY_DATES)]  # 6-way ties
        else:
            date = dt.datetime(1995, 1, 1) + dt.timedelta(days=(k * 7) % 2400)
        status = "OFP"[k % 3]
        total = [15000.00, 15000.00, 301.13, 99999.99, 0.01][k % 5]
        rows.append((k, cust, status, total, date, _PRIORITIES[k % 5]))
    return rows


def _lineitems(orders):
    rows = []
    by_key = {o[0]: o for o in orders}
    for ok in range(280):  # orders 280..299 have NO lineitems (Q4 shape)
        odate = by_key[ok][4]
        for ln in range(1, 5):
            i = ok * 4 + ln
            qty = [1.0, 23.0, 24.0, 25.0, 50.0, 24.0][i % 6]  # thresholds
            price = [901.00, 901.00, 88.88, 45000.00][i % 4]
            disc = [0.0, 0.05, 0.06, 0.07, 0.1][i % 5]  # BETWEEN edges
            tax = [0.0, 0.04, 0.08][i % 3]
            rf = "ANR"[i % 3]
            ls = "OF"[i % 2]
            ship = odate + dt.timedelta(days=1 + (i % 90))
            rows.append(
                (ok, i % 80, i % 10, ln, qty, price, disc, tax, rf, ls, ship)
            )
    return rows


@pytest.fixture(scope="session")
def adversarial_tpch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_adv_tpch")
    for t in ("region", "nation", "events", "documents", "embeddings"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), d / f"{t}.parquet")
    orders = _orders()
    for t, rows in (
        ("customer", _customers()),
        ("supplier", _suppliers()),
        ("part", _parts()),
        ("orders", orders),
        ("lineitem", _lineitems(orders)),
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


def _affected() -> list[str]:
    pat = re.compile(r"\bevents\b|\bdocuments\b|\bembeddings\b")
    return sorted(n for n, sql in ORACLE.items() if not pat.search(sql))


def test_affected_query_count_is_stable():
    assert len(_affected()) >= 65


def test_oracle_parity_on_adversarial_tpch(spark, adversarial_tpch_dir):
    bad: dict[str, str] = {}
    for name in _affected():
        try:
            compare(spark, adversarial_tpch_dir, QUERIES[name], ORACLE[name])
        except Exception as ex:  # noqa: BLE001 — cataloging, not handling
            first = (str(ex).splitlines() or [""])[0]
            bad[name] = f"{type(ex).__name__}: {first[:200]}"
    assert not bad, (
        f"{len(bad)} queries diverge from their oracle on the "
        f"adversarial star corpus: {bad}"
    )
