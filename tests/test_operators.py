"""Direct operator-level tests: every exported symbol in
``operators/`` gets coverage here (the oracle-parity gate covers the
query layer; this covers the library API a user calls directly).

Float-producing operators (plain ``F.avg``/``F.stddev`` frames in
``add_rolling_features``) are checked against DuckDB with a 1e-9
absolute tolerance — their accumulation order is engine-specific by
design; the bit-exact cents technique lives in the query layer.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.operators import (
    add_drive_age,
    add_rolling_features,
    chronological_split,
    downsample_negatives,
    top_k_per_group,
)
from big_data_backblaze_hard_drive_failure_spark.operators.features import (
    rolling_feature_columns,
)
from big_data_backblaze_hard_drive_failure_spark.operators.labeling import (
    lead_label,
    leakage_filter,
)
from big_data_backblaze_hard_drive_failure_spark.operators.metrics import (
    operational_summary,
)
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

from .oracle import run_oracle


def _events(spark, sf):
    return load(spark, sf, "events")


def test_add_rolling_features_duckdb_tolerance(spark, sf_smoke):
    """add_rolling_features (plain float frames) vs DuckDB windows,
    |diff| <= 1e-9 — verifies the operator users actually call."""
    df = add_rolling_features(
        _events(spark, sf_smoke).select("user_id", "event_id", "ts", "value"),
        metrics=["value"],
        entity="user_id",
        order=["ts", "event_id"],
    )
    got = {
        r["event_id"]: r
        for r in df.select(
            "event_id", "value_mean_7d", "value_mean_14d",
            "value_std_7d", "value_max_7d", "value_delta_1d",
        ).collect()
    }
    _, rows = run_oracle(
        sf_smoke,
        """
        SELECT event_id,
               AVG(value) OVER w7 AS m7,
               AVG(value) OVER w14 AS m14,
               COALESCE(STDDEV(value) OVER w7, 0) AS s7,
               MAX(value) OVER w7 AS x7,
               COALESCE(value - LAG(value, 1) OVER w1, 0) AS d1
        FROM events
        WINDOW
            w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
            w7 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
            w14 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        """,
    )
    assert len(rows) == len(got)
    for eid, m7, m14, s7, x7, d1 in rows:
        g = got[eid]
        for a, b in [
            (g["value_mean_7d"], m7),
            (g["value_mean_14d"], m14),
            (g["value_std_7d"], s7),
            (g["value_max_7d"], x7),
            (g["value_delta_1d"], d1),
        ]:
            assert math.isclose(a, float(b), abs_tol=1e-9), (eid, a, b)


def test_rolling_feature_columns_custom_windows():
    """Non-default windows derive frames AND suffixes (round-1 advice:
    (30, 90) must not silently emit 7-row std/max)."""
    cols = rolling_feature_columns(
        ["value"], "user_id", ["ts"], windows=(30, 90)
    )
    assert set(cols) == {
        "value_mean_30d",
        "value_mean_90d",
        "value_std_30d",
        "value_max_30d",
        "value_delta_1d",
    }


def test_add_drive_age_row_number(spark, sf_smoke):
    df = add_drive_age(
        _events(spark, sf_smoke), "user_id", ["ts", "event_id"], name="age"
    )
    per_user = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("age").alias("lo"),
        F.max("age").alias("hi"),
        F.countDistinct("age").alias("d"),
    )
    bad = per_user.filter(
        (F.col("lo") != 1)
        | (F.col("hi") != F.col("n"))
        | (F.col("d") != F.col("n"))
    )
    assert bad.count() == 0  # age is exactly 1..n per entity


def test_lead_label_invariants(spark, sf_smoke):
    """SURVEY §5: lead alignment + leakage filter invariants."""
    df = _events(spark, sf_smoke).select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("f"),
    )
    labeled = lead_label(df, "user_id", ["ts", "event_id"], "f")
    # last row per user must be labeled 0 (lead NULL -> otherwise(0))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = labeled.withColumn("rn", F.row_number().over(w)).filter(
        "rn = 1 AND failure_next_24h != 0"
    )
    assert last.count() == 0
    # leakage filter removes every currently-failing row
    filtered = leakage_filter(labeled, "f")
    assert filtered.filter("f = 1").count() == 0


def test_chronological_split_partitions_everything(spark, sf_smoke):
    df = _events(spark, sf_smoke)
    train, val, test = chronological_split(
        df.withColumn("day", F.to_date("ts")),
        "day",
        "2024-01-15",
        "2024-01-25",
    )
    n = df.count()
    nt, nv, ns = train.count(), val.count(), test.count()
    assert nt + nv + ns == n  # no row lost or double-counted
    assert nt > 0 and ns > 0
    assert train.agg(F.max("day")).first()[0] < val.agg(F.min("day")).first()[0]


def test_downsample_negatives_ratio(spark, sf_smoke):
    df = _events(spark, sf_smoke).select(
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("label"),
        "event_id",
    )
    pos_n = df.filter("label = 1").count()
    out = downsample_negatives(df, "label", ratio=2.0, seed=42)
    out_pos = out.filter("label = 1").count()
    out_neg = out.filter("label = 0").count()
    assert out_pos == pos_n  # every positive kept
    # Bernoulli sampling: expect ~2x positives, allow wide slack
    assert 0.5 * pos_n <= out_neg <= 4.0 * pos_n


def test_downsample_negatives_keeps_all_when_ratio_exceeds(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(5)] + [(0, i) for i in range(5, 10)],
        "label INT, id INT",
    )
    out = downsample_negatives(df, "label", ratio=100.0)
    assert out.count() == 10  # fraction capped at 1.0 -> keep everything


def test_top_k_per_group_exact(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
        "g STRING, v INT",
    )
    out = top_k_per_group(
        df, ["g"], [F.col("v").desc(), F.col("v")], k=2, keep_rank=False
    )
    rows = {(r["g"], r["v"]) for r in out.collect()}
    assert rows == {("a", 9), ("a", 8), ("b", 2), ("b", 1)}


def test_operational_summary_math():
    s = operational_summary(
        [
            {"alert": 1, "target": 1, "n": 202},
            {"alert": 0, "target": 1, "n": 46},
            {"alert": 1, "target": 0, "n": 2_525_188},
            {"alert": 0, "target": 0, "n": 100},
        ]
    )
    # the reference's published operational numbers (readme.md:166-173)
    assert s["tp"] == 202 and s["fn"] == 46
    assert round(s["recall"], 2) == 0.81
    assert s["precision"] == pytest.approx(202 / (202 + 2_525_188))


def test_operational_summary_zero_division():
    s = operational_summary([])
    assert s["recall"] == 0.0 and s["precision"] == 0.0


def test_cents_assumption_guard(spark, sf_oracle):
    """ADVICE.md guard: the exact-cents technique requires 2-decimal
    fixture values — fail loudly if a fixture change breaks that."""
    bad = (
        _events(spark, sf_oracle)
        .withColumn(
            "rt", F.abs(F.round(F.col("value") * 100) / 100.0 - F.col("value"))
        )
        .filter(F.col("rt") > 1e-9)
    )
    assert bad.count() == 0


def test_stage_boundary_persists(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        lineage_cut,
        stage_boundary,
    )

    df = _events(spark, sf_smoke).select("event_id", "value")
    n = df.count()
    staged = stage_boundary(df)
    assert staged.storageLevel.useMemory or staged.storageLevel.useDisk
    assert staged.count() == n
    staged.unpersist()

    cut = lineage_cut(df)
    assert cut.count() == n


def test_stage_boundary_lru_bounds_live_caches(spark, sf_smoke):
    """The staged-frame LRU must cap simultaneously-live SQL caches
    (ContextCleaner never frees CacheManager entries) and
    release_stage_boundaries must drop them all."""
    from big_data_backblaze_hard_drive_failure_spark.operators import staging

    base = _events(spark, sf_smoke).select("event_id", "value")
    staging.release_stage_boundaries()
    frames = [
        staging.stage_boundary(base.filter(F.col("event_id") % 100 == i),
                               materialize=False)
        for i in range(staging._MAX_LIVE_STAGED + 3)
    ]
    assert len(staging._LIVE_STAGED) == staging._MAX_LIVE_STAGED
    # the oldest overflow victims were unpersisted, the newest kept
    assert frames[0].storageLevel.useMemory is False
    assert frames[-1].storageLevel.useMemory or frames[-1].storageLevel.useDisk
    # an evicted frame still computes correctly (recompute, not error)
    assert frames[0].count() == base.filter(F.col("event_id") % 100 == 0).count()
    released = staging.release_stage_boundaries()
    assert released == staging._MAX_LIVE_STAGED
    assert not staging._LIVE_STAGED
    assert frames[-1].storageLevel.useMemory is False


def test_row_udf_matches_pandas_udf(spark, sf_smoke):
    """Typed row-wise UDF (reference F2, typed) agrees with the
    vectorized scorer — same arithmetic, different execution path."""
    from big_data_backblaze_hard_drive_failure_spark.ml.scorer import (
        score_row_udf,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        MODEL,
        scored_frame,
    )

    via_pandas = scored_frame(spark, sf_smoke, via="pandas_udf").select(
        "event_id", "failure_probability"
    )
    feats = scored_frame(spark, sf_smoke, via="column").drop(
        "failure_probability"
    )
    via_row = feats.withColumn(
        "p_row", score_row_udf(MODEL)(*MODEL.features)
    ).select("event_id", "p_row")
    diff = (
        via_pandas.join(via_row, "event_id")
        .filter(F.col("failure_probability") != F.col("p_row"))
        .count()
    )
    assert diff == 0


def test_approx_count_distinct_accuracy(spark, sf_oracle):
    """HLL sketch within its configured relative error of the exact
    distinct count (star_approx_distinct is rows-only by design)."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    row = QUERIES["star_approx_distinct"](spark, sf_oracle).first()
    approx, exact = row["approx_customers"], row["exact_customers"]
    assert abs(approx - exact) <= max(3, 0.05 * exact), (approx, exact)


def test_neardup_components_match_union_find(spark, sf_smoke):
    """Iterative label propagation converges to the true connected
    components (union-find ground truth on the collected edge list)."""
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        _signatures,
        datapipe_neardup_components,
    )

    got = {
        r["doc_id"]: r["component_id"]
        for r in datapipe_neardup_components(spark, sf_smoke).collect()
    }

    sig = _signatures(spark, sf_smoke).collect()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in sig:
        union(("d", r["doc_id"]), ("b0", r["mh0"] + r["mh1"]))
        union(("d", r["doc_id"]), ("b1", r["mh2"] + r["mh3"]))
    want = {}
    comp_min: dict = {}
    for r in sig:
        root = find(("d", r["doc_id"]))
        comp_min.setdefault(root, r["doc_id"])
        comp_min[root] = min(comp_min[root], r["doc_id"])
    for r in sig:
        want[r["doc_id"]] = comp_min[find(("d", r["doc_id"]))]
    assert got == want


def test_load_csv_with_catalog_schema(spark, sf_smoke, tmp_path):
    """sources.catalog.load_csv: explicit-schema CSV ingestion (S1)
    round-trips a fixture table exactly."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load_csv,
    )

    nation = load(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_csv")
    nation.coalesce(1).write.option("header", True).mode("overwrite").csv(
        path
    )
    back = load_csv(spark, path, "nation")
    assert back.schema == nation.schema
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_threshold_at_recall_approx_path(spark, sf_smoke):
    """approx_percentile variant lands within a tolerance of the exact
    threshold (the 100TB path for dense score columns)."""
    from big_data_backblaze_hard_drive_failure_spark.ml.threshold import (
        threshold_at_recall,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        scored_frame,
    )

    scored = scored_frame(spark, sf_smoke, via="column")
    exact = threshold_at_recall(
        scored, "failure_probability", "is_error", 0.8, exact=True
    ).first()["threshold"]
    approx = threshold_at_recall(
        scored, "failure_probability", "is_error", 0.8, exact=False
    ).first()["threshold"]
    assert abs(exact - approx) < 0.05


def test_csv_corrupt_record_handling(spark, tmp_path):
    """Dirty-ingest posture: PERMISSIVE CSV read surfaces malformed
    rows as nulls instead of killing the job (the 100TB reality)."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "r_regionkey,r_name\n1,AMERICA\nnot_an_int,EUROPE\n3,ASIA\n"
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_csv,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        schema_for,
    )

    df = read_csv(spark, str(p), schema_for("region"))
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["r_regionkey"] is None]
    assert len(bad) == 1 and bad[0]["r_name"] == "EUROPE"


def test_ivf_recall_vs_brute_force(spark, sf_smoke):
    """IVF probing 4/16 cells must recover a solid fraction of the
    true cosine top-3 (approximation quality pinned, not assumed)."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    truth = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["datapipe_cosine_topk"](spark, sf_smoke).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["datapipe_knn_ivf"](spark, sf_smoke).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.4, f"IVF recall@3 too low: {recall}"


def test_ivf_nprobe_recall_cost_curve(spark, sf_smoke):
    """The IVF recall knob behaves as designed: probing more cells
    never loses recall (nprobe 1 -> 2 -> 4 monotone non-decreasing),
    and full probing (nprobe = k_cells) equals brute force exactly —
    pinning that IVF's only approximation is the probe set."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        datapipe_knn_ivf,
    )

    truth = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["datapipe_cosine_topk"](spark, sf_smoke).collect()
    }
    recalls = {}
    for nprobe in (1, 2, 4, 16):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in datapipe_knn_ivf(
                spark, sf_smoke, k_cells=16, nprobe=nprobe
            ).collect()
        }
        recalls[nprobe] = len(truth & approx) / len(truth)
    assert recalls[1] <= recalls[2] <= recalls[4] <= recalls[16], recalls
    assert recalls[16] == 1.0, f"full probe must equal brute force: {recalls}"


def test_merge_upsert_idempotent_and_deletes(spark):
    from big_data_backblaze_hard_drive_failure_spark.operators.merge import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)],
        "k INT, v STRING, version INT, deleted BOOLEAN",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 2, False),   # update
            (4, "d", 1, False),    # insert
            (3, "c", 2, True),     # delete
            (1, "a-tied", 1, False),  # same version as base -> changes win
        ],
        "k INT, v STRING, version INT, deleted BOOLEAN",
    )
    once = merge_upsert(base, changes, ["k"], ["version"], tombstone="deleted")
    got = {r["k"]: r["v"] for r in once.collect()}
    assert got == {1: "a-tied", 2: "b2", 4: "d"}  # 3 deleted

    # idempotent: re-applying the same change set changes nothing
    twice = merge_upsert(once, changes, ["k"], ["version"], tombstone="deleted")
    assert {r["k"]: r["v"] for r in twice.collect()} == got

    # NULL tombstone means NOT deleted (snapshots that never tracked
    # deletes must survive the merge)
    base_null = spark.createDataFrame(
        [(9, "keep", 1, None)], "k INT, v STRING, version INT, deleted BOOLEAN"
    )
    kept = merge_upsert(
        base_null, changes, ["k"], ["version"], tombstone="deleted"
    )
    assert {r["k"] for r in kept.collect()} >= {9}


def test_approx_percentile_rank_error_bound(spark, sf_smoke):
    """GK sketch contract: with accuracy a, the returned value's RANK
    is within n/a of the target rank. Verify by locating each approx
    value's rank among the exact sorted values per group."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    rows = QUERIES["star_approx_percentiles"](spark, sf_smoke).collect()
    assert rows
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    vals = {
        st: sorted(
            r["o_totalprice"]
            for r in load(spark, sf_smoke, "orders")
            .filter(F.col("o_orderstatus") == st)
            .select("o_totalprice")
            .collect()
        )
        for st in {r["o_orderstatus"] for r in rows}
    }
    import bisect

    for r in rows:
        v = vals[r["o_orderstatus"]]
        n = len(v)
        assert r["n"] == n
        for q, approx in zip((0.5, 0.95), (r["approx_p50"], r["approx_p95"])):
            rank = bisect.bisect_left(v, approx)
            assert abs(rank - q * n) <= max(n / 10000, 1) + 1, (
                r["o_orderstatus"], q, approx, rank, q * n,
            )


def test_hll_sketch_union_error_bound(spark, sf_smoke):
    """DataSketches HLL (default lgConfigK=12): relative error on the
    unioned estimate stays within ~3*1.04/sqrt(2^12) ≈ 4.9% of the
    exact distinct count."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    [row] = QUERIES["star_hll_sketch_union"](spark, sf_smoke).collect()
    exact = (
        load(spark, sf_smoke, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert row["n_slices"] >= 1
    assert abs(row["est_distinct_cust"] - exact) <= max(0.05 * exact, 2), (
        row["est_distinct_cust"], exact,
    )


def test_sample_by_strata_fractions(spark, sf_smoke):
    """df.stat.sampleBy: per-stratum sampled counts track the requested
    fractions (±15% relative at fixture size; exact for fraction=1.0)."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    got = {
        r["event_type"]: r["n_sampled"]
        for r in QUERIES["star_sample_by_strata"](spark, sf_smoke).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fractions = {"click": 0.5, "view": 0.25, "purchase": 1.0,
                 "signup": 1.0, "error": 1.0}
    for et, frac in fractions.items():
        want = totals[et] * frac
        if frac == 1.0:
            assert got[et] == totals[et]
        else:
            assert abs(got[et] - want) <= 0.15 * totals[et] + 5, (
                et, got[et], want,
            )


# ---------------------------------------------------------------
# invariants for the model-monitoring / retrieval / SCD2 family
# (cross-engine equality is already pinned by test_oracle_parity;
# these check the SEMANTIC contracts the oracle can't express)
# ---------------------------------------------------------------
def test_psi_drift_partitions_every_event(spark, sf_smoke):
    import math

    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        mlops_psi_drift,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    rows = mlops_psi_drift(spark, sf_smoke).collect()
    total = sum(r["n_ref"] + r["n_cur"] for r in rows)
    assert total == load(spark, sf_smoke, "events").count()
    assert all(math.isfinite(r["psi_term"]) for r in rows)


def test_ks_drift_is_a_distance(spark, sf_smoke):
    row = __import__(
        "big_data_backblaze_hard_drive_failure_spark.plans.mlops",
        fromlist=["mlops_ks_drift"],
    ).mlops_ks_drift(spark, sf_smoke).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["n_ref"] > 0 and row["n_cur"] > 0


def test_lift_gain_monotone_and_exhaustive(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        mlops_lift_gain,
    )

    rows = mlops_lift_gain(spark, sf_smoke).collect()  # bin descending
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains), "gain must be cumulative walking down"
    assert abs(gains[-1] - 1.0) < 1e-9, "walking all bins captures all positives"


def test_bm25_returns_docs_containing_query_terms(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        BM25_TERMS,
        datapipe_bm25_rank,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    ranked = datapipe_bm25_rank(spark, sf_smoke).collect()
    assert ranked and all(r["bm25"] > 0 for r in ranked)
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_smoke, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in ranked]))
        .collect()
    }
    for r in ranked:
        assert any(t in texts[r["doc_id"]].split(" ") for t in BM25_TERMS)


def test_unigram_logprob_bounds(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        datapipe_unigram_logprob,
    )

    rows = datapipe_unigram_logprob(spark, sf_smoke).collect()
    assert rows and all(r["n_tokens"] > 0 for r in rows)
    # every token probability < 1 => mean log-prob strictly negative
    assert all(r["avg_logprob"] < 0 for r in rows)


def test_scd2_intervals_tile_each_user_timeline(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.plans.star import (
        star_scd2_history,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    hist = star_scd2_history(spark, sf_smoke).collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    counts = {
        r["user_id"]: r["n"]
        for r in load(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert sum(r["n_events"] for r in rows) == counts[uid]
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] == 1 and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            # half-open intervals tile: next version starts where the
            # previous one closes, and versions alternate event_type
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_incremental_neardup_only_flags_batch_docs(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        datapipe_incremental_neardup,
    )

    rows = datapipe_incremental_neardup(spark, sf_smoke).collect()
    assert rows, "the synthetic corpus always has cross-slice collisions"
    for r in rows:
        # candidates come from the arriving batch; partners from the corpus
        assert r["doc_id"] % 10 == 0
        assert r["partner_id"] % 10 != 0
        assert r["n_old_partners"] >= 1
        assert 0.0 <= r["jaccard"] <= 1.0


def test_scd2_pit_join_matches_at_most_one_version(spark, sf_smoke):
    """SCD2 intervals tile each user's timeline (tested above), so a
    point-in-time probe can match AT MOST one version — a duplicate
    match means overlapping intervals, the classic PIT-join bug."""
    from big_data_backblaze_hard_drive_failure_spark.plans.star import (
        star_scd2_pit_join,
    )

    pit = star_scd2_pit_join(spark, sf_smoke)
    n = pit.count()
    assert n > 0
    assert pit.select("event_id").distinct().count() == n


def test_bloom_dedup_has_no_false_negatives(spark, sf_smoke):
    """Structural Bloom guarantee: a true duplicate's fingerprint set
    exactly the positions the probe checks, so every true_dup row MUST
    be bloom-flagged. (False positives are allowed — that's the 'dup
    candidate needs verification' contract — but at 2^20 bits over a
    tiny corpus they should be rare.)"""
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        datapipe_bloom_dedup,
    )

    rows = datapipe_bloom_dedup(spark, sf_smoke).collect()
    assert rows
    assert all(r["doc_id"] % 10 == 0 for r in rows)
    dups = [r for r in rows if r["true_dup"] == 1]
    assert all(r["bloom_hit"] == 1 for r in dups), "Bloom false negative"
    # the filter must discriminate: non-dup batch docs mostly miss
    clean = [r for r in rows if r["true_dup"] == 0]
    if clean:
        fp_rate = sum(r["bloom_hit"] for r in clean) / len(clean)
        assert fp_rate <= 0.5, f"Bloom false-positive rate {fp_rate}"


def test_dsir_score_separates_target_language(spark, sf_smoke):
    """The DSIR importance score ranks target-distribution (en) docs
    above every other language ON AVERAGE — the property the
    resampling step relies on. (Per-doc scores are noisy on the
    shared-vocab synthetic corpus, so the assertion is on group
    means over the full scored frame, not on a top-k cut.)"""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        _dsir_scored,
    )

    means = {
        r["lang"]: r["m"]
        for r in _dsir_scored(spark, sf_smoke)
        .groupBy("lang")
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    }
    assert means["en"] == max(means.values()), means


def test_ewma_matches_recursive_definition(spark, sf_smoke):
    """Closed-form EWMA == the recursive definition replayed in plain
    Python per user (exactness up to float tolerance)."""
    from big_data_backblaze_hard_drive_failure_spark.plans.reference import (
        ref_ewma_smoothing,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ref_ewma_smoothing(spark, sf_smoke).collect()
    }
    events = (
        load(spark, sf_smoke, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in sorted(events, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    for uid, xs in series.items():
        s = xs[0]
        for x in xs[1:]:
            s = 0.3 * x + 0.7 * s
        n, ewma = got[uid]
        assert n == len(xs)
        assert abs(ewma - s) < 1e-4, (uid, ewma, s)


# ------------------------------------------------------------------
# operators.prefix.global_prefix_sum — the scalable running total
# must equal the single-task unpartitioned-window spelling exactly.
# ------------------------------------------------------------------
def test_global_prefix_sum_matches_unpartitioned_window(spark, sf_smoke):
    from pyspark.sql import Window

    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sum,
    )

    ev = load(spark, sf_smoke, "events").select("event_id", "value")
    got = {
        r["event_id"]: r["running_total"]
        for r in global_prefix_sum(
            ev, ["event_id"], "value", n_partitions=7
        ).collect()
    }
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["event_id"]: r["rt"]
        for r in ev.withColumn("rt", F.sum("value").over(w)).collect()
    }
    assert got.keys() == want.keys()
    # same per-partition left-to-right accumulation order is NOT
    # guaranteed between the two plans -> float tolerance
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)


def test_global_prefix_sum_exclusive_starts_at_zero(spark):
    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, 10) for i in range(1, 101)], "k int, v int"
    )
    out = global_prefix_sum(
        df, ["k"], "v", out_col="below", n_partitions=5, exclusive=True
    )
    rows = {r["k"]: r["below"] for r in out.collect()}
    assert rows[1] == 0
    assert all(rows[k] == (k - 1) * 10 for k in rows)


def test_global_prefix_sums_multi_column_shares_one_pass(spark):
    """The multi-column variant must (a) agree with two independent
    single-column passes and (b) plan exactly ONE data-sized exchange
    — the whole point of sharing the scan (a PR curve needs a running
    count AND a running positive count over one order). With literal
    bucket boundaries, no sampled range exchange exists anywhere, and
    the offsets branch map-side-combines BEFORE its exchange, so that
    exchange carries K rows, not data."""
    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sum,
        global_prefix_sums,
    )

    df = spark.createDataFrame(
        [(i, 1, i % 3) for i in range(1, 201)], "k int, one int, v int"
    )
    multi = global_prefix_sums(
        df, ["k"], {"n": "one", "sv": "v"}, n_partitions=5
    )
    rows = {r["k"]: (r["n"], r["sv"]) for r in multi.collect()}
    a = {
        r["k"]: r["n"]
        for r in global_prefix_sum(df, ["k"], "one", "n", 5).collect()
    }
    b = {
        r["k"]: r["sv"]
        for r in global_prefix_sum(df, ["k"], "v", "sv", 5).collect()
    }
    assert rows == {k: (a[k], b[k]) for k in a}
    plan = (
        multi._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("Initial Plan")[0]
    )
    # no sampled range partitioning anywhere: bucket ids are literal
    # boundaries (branch-consistent by construction)
    assert "rangepartitioning" not in plan.lower(), plan
    # exactly ONE data-sized exchange (hash on the bucket expression),
    # which the offsets branch REUSES — the spark_partition_id guard
    # column exists precisely to keep both branch subtrees identical
    data_exchanges = [
        line
        for line in plan.split("\n")
        if "Exchange hashpartitioning" in line and "Reused" not in line
    ]
    assert len(data_exchanges) == 1, plan
    assert "ReusedExchange" in plan, plan
    # ONE window line computes BOTH running sums PARTITIONED BY the
    # bucket id (partition-by form = comma right after the pid attr;
    # the K-row offsets window instead ORDERS by it)
    import re

    local_windows = [
        line
        for line in plan.split("\n")
        if re.search(r"windowspecdefinition\(__prefix_pid#\d+,", line)
    ]
    assert len(local_windows) == 1, plan
    assert local_windows[0].count("sum(") >= 2, local_windows[0]


def test_jaccard_prefix_join_complete_on_small_sets(spark, tmp_path):
    """Prefix-filter completeness at the edge the integer ceil gets
    wrong first: single-shingle docs (s=1 -> prefix must be 1, not 0)
    and 3-shingle docs. Identical docs MUST be found."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    rows = [
        (1, "a b c"),
        (2, "a b c"),
        (3, "a b c d e"),
        (4, "a b c d e"),
        (5, "x y z w v"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        (r["da"], r["db"])
        for r in QUERIES["datapipe_jaccard_prefix_join"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == [(1, 2), (3, 4)], got


def test_pagerank_mass_conservation_and_km_monotone(spark, sf_smoke):
    """PageRank: every rank positive; total mass = 1 exactly when no
    nation is dangling (all have out-edges), otherwise < 1 (the
    documented simplified formulation leaks dangling mass).
    Kaplan-Meier: survival strictly in (0,1] and nonincreasing in t;
    at-risk counts nonincreasing."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    pr = QUERIES["star_pagerank_nations"](spark, sf_smoke).collect()
    assert len(pr) == 25
    ranks = [r.pagerank for r in pr]
    assert all(v > 0 for v in ranks)
    assert sum(ranks) <= 1.0 + 1e-6

    km = sorted(
        QUERIES["mlops_kaplan_meier"](spark, sf_smoke).collect(),
        key=lambda r: r.t_days,
    )
    assert km, "life table must have failure rows"
    surv = [r.survival for r in km]
    risk = [r.n_risk for r in km]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(a > b for a, b in zip(risk, risk[1:]))
    assert all(r.n_fail <= r.n_risk for r in km)


def test_logrank_shares_one_prefix_pass(spark, sf_smoke):
    """mlops_logrank_test's two cumulative-at-risk columns must ride
    ONE shared prefix-sum pass: exactly 2 Window nodes in the
    optimized plan (the shared per-bucket local scan + the K-row
    offsets frame). Two CHAINED single-column passes would plan 4."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    df = QUERIES["mlops_logrank_test"](spark, sf_smoke)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    n_windows = sum(
        line.strip().lstrip(":+- ").startswith("Window ")
        for line in opt.split("\n")
    )
    assert n_windows == 2, opt


def test_prefix_sum_null_and_nan_key_ordering(spark):
    """The binary-search bucket tree must agree with Spark's window
    order at both extremes: NULL keys sort FIRST (they fall through
    every otherwise() to bucket 0) and NaN doubles sort LAST (NaN > b
    for every boundary). Running totals across 8 buckets prove it."""
    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sum,
    )

    rows = [(float("nan"), 104, 1), (None, 100, 1)] + [
        (float(i), i, 1) for i in range(1, 100)
    ]
    df = spark.createDataFrame(rows, "x double, id int, one int")
    out = global_prefix_sum(
        df, ["x", "id"], "one", "n", n_partitions=8
    ).collect()
    d = {r["id"]: r["n"] for r in out}
    assert d[100] == 1      # NULL key: first in the total order
    assert d[1] == 2 and d[99] == 100
    assert d[104] == 101    # NaN key: last in the total order
