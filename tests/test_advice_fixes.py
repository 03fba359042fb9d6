"""Regression tests for the round-2 ADVICE.md findings.

Each test constructs the exact boundary condition the advisor flagged
(sub-second events at a range-frame edge, docs shorter than the
shingle width, outer-join salting, an exact-gap session boundary) and
pins the fixed behavior — parity by construction, not by fixture luck.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES
from tests.oracle import compare


def _write_events(tmp_path, rows):
    """Synthetic events.parquet (schema-compatible with the fixture
    table) holding exactly the boundary rows under test."""
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    table = pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_time_range_window_subsecond_boundary(spark, tmp_path):
    """Events straddling the 7200 s frame edge by sub-second margins:
    second-resolution sort keys floor (Spark) vs round (DuckDB) and
    disagree; exact-microsecond keys must agree on both engines AND
    produce the analytically-correct frame membership."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 600_000)
    in_frame = dt.datetime(2024, 1, 1, 2, 0, 0, 500_000)  # gap 7199.9 s
    out_frame = dt.datetime(2024, 1, 1, 2, 0, 0, 900_000)  # gap 7200.3 s
    sf = _write_events(
        tmp_path,
        [
            (1, t0, 1, "view", 1.0, "{}"),
            (2, in_frame, 1, "view", 1.0, "{}"),
            (3, out_frame, 1, "view", 1.0, "{}"),
        ],
    )
    compare(spark, sf, QUERIES["ref_time_range_window"], ORACLE["ref_time_range_window"])
    rows = {
        r["event_id"]: r["n_2h"]
        for r in QUERIES["ref_time_range_window"](spark, sf).collect()
    }
    # event 2: frame [00:00:00.5, 02:00:00.5] contains events 1 and 2;
    # event 3: frame [00:00:00.9, 02:00:00.9] EXCLUDES event 1 (gap
    # 7200.3 s) but contains event 2 — a floored-seconds key would
    # wrongly include event 1.
    assert rows == {1: 1, 2: 2, 3: 2}


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Spark's session_window MERGES an event arriving EXACTLY gap
    after the previous one (the window end is inclusive for the merge
    test; only gap + epsilon starts a new session — verified against
    pyspark directly, contra round-2 ADVICE item 4). The oracle's <=
    therefore matches; this pins both engines on the exact boundary."""
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    sf = _write_events(
        tmp_path,
        [
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=30), 7, "view", 1.0, "{}"),
            (3, t0 + dt.timedelta(minutes=30, microseconds=1), 8, "view", 1.0, "{}"),
            (4, t0 + dt.timedelta(minutes=60, microseconds=2), 8, "view", 1.0, "{}"),
        ],
    )
    compare(spark, sf, QUERIES["ref_session_windows"], ORACLE["ref_session_windows"])
    sessions = QUERIES["ref_session_windows"](spark, sf).collect()
    # user 7: exact gap merges -> one session of 2
    # user 8: gap + 1us splits -> two sessions of 1
    per_user = sorted((r["user_id"], r["n_events"]) for r in sessions)
    assert per_user == [(7, 2), (8, 1), (8, 1)]


def test_ngram_shingles_short_doc(spark):
    """Docs with fewer than n tokens must yield an EMPTY shingle array
    (matching the oracle's range() semantics), not crash on the
    descending-sequence element_at(..., 0)."""
    from big_data_backblaze_hard_drive_failure_spark.functions.text import (
        ngram_shingles,
    )

    df = spark.createDataFrame(
        [("a b",), ("one two three",), ("w x y z",), ("solo",)], ["text"]
    )
    out = [r["sh"] for r in df.select(ngram_shingles("text", 3).alias("sh")).collect()]
    assert out[0] == []
    assert out[1] == ["one two three"]
    assert out[2] == ["w x y", "x y z"]
    assert out[3] == []


def test_salted_join_rejects_small_side_outer(spark):
    """right/full outer would duplicate unmatched small-side rows once
    per salt — the operator must refuse instead of silently corrupting."""
    from big_data_backblaze_hard_drive_failure_spark.operators.skew import (
        salted_join,
    )

    big = spark.range(100).withColumn("k", F.col("id") % 3)
    small = spark.createDataFrame([(0, "a"), (1, "b"), (9, "unmatched")], ["k", "v"])
    for how in ("right", "full", "full_outer", "right_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, "k", how=how)
    # supported types still equal the plain join
    plain = big.join(small, "k", "left").orderBy("id", "v").collect()
    salted = salted_join(big, small, "k", how="left").orderBy("id", "v").collect()
    assert plain == salted


def _write_documents(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    table = pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        )
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "name",
    [
        "ref_alerts_daily", "ref_ewma_smoothing", "ref_longest_error_streak",
        "ref_mase_seasonal_eval", "mlops_kaplan_meier",
        "mlops_daily_ops_mart", "mlops_backtest_folds",
    ],
)
def test_events_queries_survive_empty_input(spark, tmp_path, name):
    """Empty-corpus robustness: an events query over a zero-row (but
    schema-complete) table must return an empty/degenerate frame, not
    crash — the behavior a daily pipeline needs on a no-data day."""
    d = _write_events(tmp_path, [])
    out = QUERIES[name](spark, d)
    assert out.count() == 0


@pytest.mark.parametrize(
    "name",
    [
        "datapipe_exact_dedup", "datapipe_text_stats",
        "datapipe_pmi_cooccurrence", "datapipe_zipf_slope",
        "datapipe_normalized_dedup", "datapipe_weighted_median_len",
    ],
)
def test_document_queries_survive_empty_input(spark, tmp_path, name):
    """Same guarantee for the documents pipeline ops: zero rows in,
    zero (or single all-zero aggregate) rows out, no exception."""
    d = _write_documents(tmp_path, [])
    out = QUERIES[name](spark, d)
    rows = out.collect()
    if rows:  # grand aggregates legitimately return one row of zeros
        assert len(rows) == 1
        first = rows[0].asDict()
        counts = [v for k, v in first.items() if k.startswith("n_")]
        assert all((v or 0) == 0 for v in counts), first


# ------------------------------------------------------------------
# Round-7 ADVICE regressions (fixed in round 8)
# ------------------------------------------------------------------


def test_stage_boundary_lru_refreshes_recency(spark):
    """The staged-frame cache is a true LRU: re-staging a live frame
    moves it to the most-recent slot, so a hot frame survives
    evictions that drop colder ones (the advisor found FIFO behavior:
    re-staging kept the original insertion slot)."""
    from big_data_backblaze_hard_drive_failure_spark.operators import staging

    staging.release_stage_boundaries()
    hot = spark.range(5)
    hot_staged = staging.stage_boundary(hot, materialize=False)
    cold = [
        staging.stage_boundary(spark.range(10 + i), materialize=False)
        for i in range(staging._MAX_LIVE_STAGED - 1)
    ]
    # cache is now exactly full, hot is the OLDEST entry; touch it
    staging.stage_boundary(hot_staged, materialize=False)
    # one more insert must evict the oldest COLD frame, not hot
    staging.stage_boundary(spark.range(999), materialize=False)
    assert id(hot_staged) in staging._LIVE_STAGED or any(
        v is hot_staged for v in staging._LIVE_STAGED.values()
    ), "re-staged hot frame was evicted — LRU recency not refreshed"
    staging.release_stage_boundaries()


def test_stage_boundary_dedups_semantically_equal_frames(spark):
    """Round-9 regression: Spark's CacheManager dedups by PLAN, so two
    builds of the same query share one cache entry. With the LRU
    keyed by object identity, both builds occupied LRU slots and the
    OLDER twin's eviction unpersisted the shared entry out from under
    the newer build (order-dependent rescan-budget failure, 'Asked to
    cache already cached data' in the log). Semantic-hash keys make a
    re-stage of an equal plan a recency refresh, not a second entry."""
    from big_data_backblaze_hard_drive_failure_spark.operators import staging

    staging.release_stage_boundaries()
    a = staging.stage_boundary(spark.range(7), materialize=False)
    b = staging.stage_boundary(spark.range(7), materialize=False)
    assert len(staging._LIVE_STAGED) == 1, (
        "semantically equal staged frames must share one LRU slot — "
        "duplicate slots reintroduce the shared-cache eviction bug"
    )
    assert a.is_cached and b.is_cached
    staging.release_stage_boundaries()


def test_stage_boundary_hash_collision_unpersists_displaced(spark):
    """Round-10 ADVICE regression: semanticHash() is 32-bit, so two
    genuinely DIFFERENT plans can share a key. Silently overwriting
    the dict value stranded the displaced frame's cache outside both
    LRU eviction and release_stage_boundaries — a session-long
    executor-storage leak. stage_boundary must detect the collision
    (sameSemantics) and unpersist the displaced frame. A real 32-bit
    collision can't be manufactured from two small plans, so plant
    one: pre-insert frame A under the key frame B will hash to."""
    from big_data_backblaze_hard_drive_failure_spark.operators import staging

    staging.release_stage_boundaries()
    a = spark.range(3).persist()
    a.count()
    b = spark.range(1000, 2000)
    with staging._STAGED_LOCK:
        staging._LIVE_STAGED[b.semanticHash()] = a  # planted collision
    staged_b = staging.stage_boundary(b, materialize=False)
    assert staged_b.is_cached
    assert not a.is_cached, (
        "hash-collision displacement must unpersist the displaced "
        "frame — otherwise its cache leaks for the session"
    )
    staging.release_stage_boundaries()


def test_fit_empty_probe_failure_does_not_mask_fit_error(spark):
    """If the emptiness probe itself dies, the ORIGINAL fit exception
    must surface, not the probe's (advisor: a dead session made
    vec.isEmpty() raise a second error that replaced the first)."""
    from big_data_backblaze_hard_drive_failure_spark.ml.training import (
        _fit_or_explain_empty,
    )

    class BoomEstimator:
        def fit(self, df):
            raise RuntimeError("original fit failure")

    class BoomFrame:
        def isEmpty(self):
            raise ValueError("probe failure: session dead")

    with pytest.raises(RuntimeError, match="original fit failure"):
        _fit_or_explain_empty(BoomEstimator(), BoomFrame(), "test_op")


def test_score_with_model_handle_invalid_keep_keeps_rows(spark):
    """score_with_model's row-drop contract is caller-controllable:
    handle_invalid='keep' scores every input row (NaN-padded vector),
    while the default 'skip' silently drops null-feature rows — the
    advisor asked for the choice to be explicit per call site."""
    from big_data_backblaze_hard_drive_failure_spark.ml.training import (
        assemble_features,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, None, 3.0)], "id int, f1 double, f2 double"
    )
    kept = assemble_features(df, ["f1", "f2"], handle_invalid="keep")
    skipped = assemble_features(df, ["f1", "f2"])  # default skip
    assert kept.count() == 2
    assert skipped.count() == 1
