"""ML-layer tests: training, scoring, threshold, artifacts, guards.

Covers SURVEY.md §2.13 (M3-M9) and §2.11 (F1-F3) beyond what the
oracle-parity gate already checks for the mlops_* queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.ml.artifacts import (
    load_model_artifact,
    load_threshold_artifact,
    save_model_artifact,
    save_threshold_artifact,
)
from big_data_backblaze_hard_drive_failure_spark.ml.scorer import (
    LinearModel,
    score_column,
    score_pandas_udf,
)
from big_data_backblaze_hard_drive_failure_spark.ml.training import (
    guarded_to_pandas,
    pr_auc,
    score_with_model,
    train_gbt,
    train_logistic,
)
from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
    MODEL,
    run_deployment_pipeline,
    scored_frame,
)


def test_pandas_udf_matches_column_expr(spark, sf_smoke):
    """The broadcast pandas_udf scorer and the JVM column expression
    must agree bitwise (same op order by construction)."""
    a = scored_frame(spark, sf_smoke, via="pandas_udf").select(
        "event_id", "failure_probability"
    )
    b = scored_frame(spark, sf_smoke, via="column").select(
        "event_id", "failure_probability"
    )
    diff = a.join(b, "event_id").filter(
        a["failure_probability"] != b["failure_probability"]
    )
    assert diff.count() == 0


def test_scores_are_probabilities(spark, sf_smoke):
    stats = (
        scored_frame(spark, sf_smoke, via="column")
        .agg(
            F.min("failure_probability").alias("lo"),
            F.max("failure_probability").alias("hi"),
        )
        .first()
    )
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_mllib_logistic_and_gbt(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    df = (
        load(spark, sf_smoke, "events")
        .select(
            "value",
            F.when(F.col("event_type") == "error", 1.0)
            .otherwise(0.0)
            .alias("label"),
        )
    )
    for train in (train_logistic, train_gbt):
        model = train(df, ["value"], "label")
        scored = score_with_model(model, df, ["value"])
        assert "failure_probability" in scored.columns
        auc = pr_auc(scored, "failure_probability", "label")
        assert 0.0 <= auc <= 1.0


def test_artifact_roundtrip(tmp_path):
    thr = tmp_path / "threshold.json"
    save_threshold_artifact(str(thr), 0.1361, 0.8, 292, extra={"note": "x"})
    loaded = load_threshold_artifact(str(thr))
    assert loaded["threshold"] == 0.1361
    assert loaded["target_recall"] == 0.8
    assert loaded["n_validation_positives"] == 292

    mp = tmp_path / "model.json"
    save_model_artifact(str(mp), MODEL)
    m = load_model_artifact(str(mp))
    assert m == MODEL


def test_ann_index_artifact_roundtrip_and_reuse(spark, sf_smoke, tmp_path):
    """Build the IVF index once, persist it, and verify a 'later job'
    assigns identical cells from the loaded artifact — the index-reuse
    contract of a production ANN pipeline."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.ml.artifacts import (
        load_ann_index_artifact,
        save_ann_index_artifact,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        _ivf_cell_expr,
        _ivf_fit_centroids,
    )
    from big_data_backblaze_hard_drive_failure_spark.functions.vector import (
        as_double_array,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    centroids = _ivf_fit_centroids(spark, sf_smoke, k_cells=8)
    path = tmp_path / "ivf.json"
    save_ann_index_artifact(str(path), centroids, extra={"corpus": "sf0.001"})
    loaded = load_ann_index_artifact(str(path))
    assert loaded["k_cells"] == len(centroids)
    assert loaded["dim"] == len(centroids[0])
    assert loaded["centroids"] == centroids  # JSON float round-trip exact

    emb = load(spark, sf_smoke, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    fresh = emb.select("vec_id", _ivf_cell_expr(centroids).alias("cell"))
    reused = emb.select(
        "vec_id", _ivf_cell_expr(loaded["centroids"]).alias("cell")
    )
    mismatches = (
        fresh.alias("f")
        .join(reused.alias("r"), "vec_id")
        .filter(F.col("f.cell") != F.col("r.cell"))
        .count()
    )
    assert mismatches == 0

    with pytest.raises(ValueError, match="not an ANN index"):
        bad = tmp_path / "bad.json"
        bad.write_text('{"kind": "other"}')
        load_ann_index_artifact(str(bad))


def test_guarded_to_pandas_cap(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    df = load(spark, sf_smoke, "events")
    with pytest.raises(ValueError, match="refusing"):
        guarded_to_pandas(df, cap=10)
    pdf = guarded_to_pandas(df.limit(5), cap=10)
    assert len(pdf) == 5


def test_deployment_pipeline_end_to_end(spark, sf_smoke, tmp_path):
    """Reference 05_01+06 loop: recall at the selected threshold must
    meet the target on the selection set (SURVEY §5 invariant)."""
    summary = run_deployment_pipeline(spark, sf_smoke, str(tmp_path))
    assert summary["tp"] + summary["fn"] > 0
    assert summary["recall"] >= 0.79  # target 0.8, quantile boundary slack
    assert (tmp_path / "threshold.json").exists()
    assert (tmp_path / "model.json").exists()


def test_linear_model_validation():
    with pytest.raises(ValueError):
        LinearModel(features=("a",), weights=(0.1, 0.2))


def test_score_column_logistic_monotone(spark):
    """Logistic variant sanity: higher z => higher p."""
    m = LinearModel(features=("x",), weights=(1.0,), sigmoid="logistic")
    df = spark.range(3).select((F.col("id") * 1.0).alias("x"))
    rows = df.select(score_column(m).alias("p")).collect()
    ps = [r["p"] for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 < p < 1.0 for p in ps)


def test_pandas_udf_logistic_path(spark):
    m = LinearModel(features=("x",), weights=(1.0,), sigmoid="logistic")
    df = spark.range(5).select((F.col("id") * 1.0).alias("x"))
    udf = score_pandas_udf(spark, m)
    rows = df.select(udf("x").alias("p")).collect()
    assert all(0.0 < r["p"] < 1.0 for r in rows)


def test_reference_pipeline_all_stages(spark, sf_smoke, tmp_path):
    """The 8-script reference pipeline end-to-end on the engine:
    stages materialize, artifacts exist, metrics are sane."""
    from big_data_backblaze_hard_drive_failure_spark.pipeline import (
        run_reference_pipeline,
    )

    summary = run_reference_pipeline(spark, sf_smoke, str(tmp_path))
    assert (tmp_path / "threshold.json").exists()
    assert (tmp_path / "model").exists()
    assert (tmp_path / "daily_alerts").exists()
    assert 0.0 <= summary["pr_auc_val"] <= 1.0
    assert summary["tp"] + summary["fn"] >= 0
    assert summary["avg_alerts_per_day"] >= 0.0


# --------------------------------------------------------------------
# Tree-model end-to-end (round-3: M3/M10 tree parity)
# --------------------------------------------------------------------
def test_forest_scorer_matches_mllib_transform(spark, sf_smoke, tmp_path):
    """The portable forest (saved-artifact node table -> numpy walk ->
    pandas_udf) must reproduce MLlib's own model.transform
    probabilities to float precision — proving the artifact-as-data
    scorer is THE same model, not an approximation."""
    import numpy as np

    from big_data_backblaze_hard_drive_failure_spark.ml.forest import (
        extract_forest,
        forest_probability,
        score_forest,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        GBT_FEATURES,
        _gbt_split,
    )

    train, test = _gbt_split(spark, sf_smoke)
    model = train_gbt(train, list(GBT_FEATURES), "label", max_depth=3, max_iter=8)
    path = str(tmp_path / "gbt")
    model.write().overwrite().save(path)
    forest = extract_forest(spark, path, GBT_FEATURES)

    jvm = score_with_model(model, test, list(GBT_FEATURES)).select(
        "event_id", "failure_probability"
    )
    py = score_forest(forest, spark, test, "p_forest").select("event_id", "p_forest")
    joined = jvm.join(py, "event_id").select(
        F.max(F.abs(F.col("failure_probability") - F.col("p_forest"))).alias("d")
    )
    assert joined.first()["d"] < 1e-9

    # and the pure-numpy path agrees with itself on a direct matrix
    rows = test.select(*GBT_FEATURES).limit(50).collect()
    X = np.array([[r[c] for c in GBT_FEATURES] for r in rows], dtype=float)
    p = forest_probability(forest, X)
    assert ((p > 0) & (p < 1)).all()


def test_gbt_contributions_identity_and_sanity(spark, sf_oracle):
    """Saabas path contributions: base + sum(contribs) == margin
    EXACTLY per alerted row, and the is_error contribution is positive
    for error rows — the same sign the linear closed form
    (mlops_feature_contributions: 0.3 * (is_error - mean)) assigns."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    rows = QUERIES["mlops_gbt_contributions"](spark, sf_oracle).collect()
    assert len(rows) == 20
    for r in rows:
        resid = abs(
            r["base"] + r["contrib_value"] + r["contrib_is_error"] - r["margin"]
        )
        assert resid < 1e-9, r
    # top-scored alerts on this fixture are error rows; the tree must
    # credit the is_error feature positively there, like the linear twin
    assert all(r["contrib_is_error"] > 0 for r in rows)


def test_gbt_score_recall_gate(spark, sf_oracle):
    """Deploy-shaped confusion from the GBT pipeline must capture at
    least the recall target (threshold chosen at that recall)."""
    from big_data_backblaze_hard_drive_failure_spark.operators.metrics import (
        operational_summary,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        RECALL_TARGET,
    )

    cm = QUERIES["mlops_gbt_score"](spark, sf_oracle).collect()
    summary = operational_summary(cm)
    assert summary["recall"] >= RECALL_TARGET, summary


def test_early_stopping_halts_before_max_rounds():
    """On a fixture with a weak learnable signal the validation metric
    plateaus and the early-stopping loop must break BEFORE max_rounds
    (Appendix early_stopping_rounds semantics), rewinding best_round
    to the best validation score."""
    import numpy as np

    from big_data_backblaze_hard_drive_failure_spark.ml.early_stopping import (
        average_precision,
        classification_report_rows,
        fit_boosted_stumps,
    )

    rng = np.random.RandomState(7)
    n = 2000
    X = rng.normal(size=(n, 2))
    y = ((X[:, 0] + 0.5 * rng.normal(size=n)) > 0).astype(float)
    X_tr, y_tr, X_va, y_va = X[:1500], y[:1500], X[1500:], y[1500:]

    model = fit_boosted_stumps(
        X_tr, y_tr, X_va, y_va, max_rounds=200, patience=5
    )
    rounds_run = len(model.history)
    assert rounds_run < 200, "early stopping never triggered"
    assert 1 <= model.best_round <= rounds_run - 5 + 1
    # best_round really is the argmax of the validation history
    assert model.history[model.best_round - 1] == max(model.history)
    # the boosted model must beat the base-rate ranking on validation
    ap_model = average_precision(y_va, model.predict_proba(X_va))
    assert ap_model > y_va.mean() + 0.2

    # report sanity on a hand case
    rows = classification_report_rows(
        np.array([1, 1, 0, 0]), np.array([1, 0, 0, 0])
    )
    by_label = {r[0]: r for r in rows}
    assert by_label["1"] == ("1", 1.0, 0.5, 2 / 3, 2)
    assert by_label["0"][4] == 2


def test_exact_int_corr_agrees_with_builtin(spark, sf_oracle):
    """The exact-integer-sum correlation (cross-engine reproducible)
    must agree with Spark's builtin corr() to fp tolerance — same
    statistic, different accumulation strategy."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    ev = load(spark, sf_oracle, "events")
    builtin = ev.select(
        F.corr(
            F.round(F.col("value") * 100).cast("long"),
            F.when(F.col("event_type") == "error", 1).otherwise(0),
        ).alias("c")
    ).first()["c"]
    mine = QUERIES["mlops_value_error_corr"](spark, sf_oracle).first()[
        "corr_value_error"
    ]
    assert abs(builtin - mine) < 1e-12


def test_isotonic_calibration_monotone_and_pav_exact(spark, sf_oracle):
    """The fitted isotonic map must be nondecreasing, and MLlib's
    distributed PAV must agree with a hand-rolled sequential PAV on
    the same (score, label) pairs — pool means compared exactly as
    weighted rationals."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    rows = QUERIES["mlops_isotonic_calibration"](
        spark, sf_oracle
    ).collect()
    preds = [r.calibrated for r in rows]
    bounds = [r.boundary for r in rows]
    assert preds == sorted(preds)
    assert bounds == sorted(bounds)

    # tiny deterministic PAV parity: fit MLlib on 8 points and
    # compare with the classic sequential pool-adjacent-violators
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    pts = [(0.1, 1.0), (0.2, 0.0), (0.3, 0.0), (0.4, 1.0),
           (0.5, 0.0), (0.6, 1.0), (0.7, 1.0), (0.8, 0.0)]
    df = spark.createDataFrame(pts, "score double, label double")
    model = IsotonicRegression(
        featuresCol="features", labelCol="label"
    ).fit(VectorAssembler(inputCols=["score"], outputCol="features")
          .transform(df))

    # sequential PAV over the same points
    pools = [[y, 1.0] for _, y in pts]  # [sum, weight]
    merged = []
    for p in pools:
        merged.append(p)
        while (
            len(merged) > 1
            and merged[-2][0] / merged[-2][1] >= merged[-1][0] / merged[-1][1]
        ):
            b = merged.pop()
            merged[-1][0] += b[0]
            merged[-1][1] += b[1]
    flat = []
    for s_, w_ in merged:
        flat.extend([s_ / w_] * int(w_))
    got = [float(model.predict(x)) for x, _ in pts]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, flat)), (got, flat)


def test_group_kfold_no_user_straddles_folds(spark, sf_smoke):
    """The leakage guarantee behind mlops_group_kfold: hash assignment
    puts every user in exactly one fold, so the per-fold distinct-user
    counts sum to the global distinct-user count (any straddle would
    double-count)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    folds = QUERIES["mlops_group_kfold"](spark, sf_smoke).collect()
    per_fold_users = sum(r["n_users"] for r in folds)
    global_users = (
        load(spark, sf_smoke, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert per_fold_users == global_users
    assert sum(r["n_rows"] for r in folds) == load(
        spark, sf_smoke, "events"
    ).filter(F.col("user_id").isNotNull()).count()
