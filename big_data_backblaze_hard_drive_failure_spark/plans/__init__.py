"""Named query registry — the engine's oracle-checked surface.

Each query is a pure function ``(spark, sf_dir) -> DataFrame``
registered via the ``@query`` decorator, optionally with the
equivalent ANSI SQL for the DuckDB oracle. ``__spark_entry__.py``
exposes these to the driver; ``tests/test_oracle_parity.py`` replays
the same comparison locally.

Conventions (SURVEY.md §7 gotchas):
  * every computed column is aliased identically in Spark and SQL
  * floats rounded on BOTH sides to dodge accumulation-order noise
  * deterministic tie-breakers under every window / limit
  * timestamps reduced to DATE where a raw timestamp isn't the point
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` means the driver runs
    its weaker rows-only check (sampling / non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from . import reference  # noqa: F401
    from . import star  # noqa: F401
    from . import tpch  # noqa: F401
    from . import datapipe  # noqa: F401
    from . import mlops  # noqa: F401
    from . import io  # noqa: F401


# Static seed for ``_driver_verified_names()``: the rounds-1–4 green
# names, kept only because rows-only rows (err="no_oracle") are
# deliberately not counted by the committed-CORRECTNESS scan below —
# everything else is self-updating from the committed files, and the
# union drives ``_reorder_unverified_first`` (never-verified names
# float to the front of the driver's 50-name sample).
_DRIVER_VERIFIED: frozenset[str] = frozenset({
    "ref_ingest_profile", "ref_project_cast", "ref_label_lead",
    "ref_label_distribution", "ref_leakage_filter", "ref_rolling_features",
    "ref_chrono_split_counts", "ref_union_downsample", "ref_union_by_name",
    "ref_sample_seeded", "ref_confusion_matrix", "ref_alerts_daily",
    "ref_avg_alerts_per_day", "ref_when_otherwise", "ref_order_limit",
    "ref_capped_sample", "ref_random_order_limit", "ref_spot_check_timeline",
    "ref_time_range_window", "ref_datetime_funcs", "ref_try_cast",
    "ref_grouped_agg_udaf", "ref_grouped_zscore", "ref_session_windows",
    "ref_funnel", "ref_gap_detection", "ref_argmax_event",
    "star_revenue_by_nation", "star_left_join_counts", "star_semi_join",
    "star_anti_join", "star_asof_join", "star_range_join",
    "star_distinct_customers", "star_rollup", "star_cube",
    "star_grouping_sets", "star_window_funcs", "star_topk_per_segment",
    "star_top_orders", "star_intersect", "star_except", "star_except_all",
    "star_pivot_status", "star_exists_sql", "star_approx_distinct",
    "star_disjunctive_filter", "star_correlated_subquery",
    "star_pricing_summary", "star_window_rank",
    # round 3/4 sample (identical sets, all green in CORRECTNESS_r04)
    "ref_grouped_arrow_stats", "ref_grouped_zscore_expr",
    "ref_sliding_window_daily", "ref_try_arithmetic", "star_bitmap_distinct",
    "star_cohort_retention", "star_conversion_latency",
    "star_cooccurrence_baskets", "star_crosstab_dow",
    "star_customer_distribution", "star_densify_daily",
    "star_dormant_customers", "star_dq_audit", "star_grouped_ols_trend",
    "star_late_shipment_priority", "star_listagg_statuses",
    "star_mad_robust_stats", "star_market_share", "star_merge_upsert",
    "star_null_semantics", "star_pandas_api_stats", "star_percentiles",
    "star_pipe_syntax_revenue", "star_pivot_multi_agg", "star_priority_buckets",
    "star_promo_revenue_ratio", "star_recursive_hierarchy",
    "star_returned_items", "star_salted_skew_join", "star_session_paths",
    "star_share_of_region", "star_shipping_priority",
    "star_sql_function_revenue", "star_time_since_last_error",
    "star_top_supplier", "star_topk_with_ties", "star_touch_attribution",
    "star_unpivot", "star_volume_shipping", "star_weekly_active_users",
    "tpch_q02_min_cost_supplier", "tpch_q04_order_priority",
    "tpch_q05_local_supplier_volume", "tpch_q06_revenue_change",
    "tpch_q09_product_profit", "tpch_q11_important_stock",
    "tpch_q16_supplier_variety", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer", "tpch_q20_part_promotion",
})


def _driver_verified_names() -> frozenset[str]:
    """The static seed set plus every query with a GREEN row in any
    committed ``CORRECTNESS_r*.json`` at the repo root — so the
    rotation updates itself the moment a round's driver results land,
    instead of waiting for a human to extend the frozenset (the
    round-3/4 staleness failure mode). Rows that errored or
    mismatched are NOT counted: they float back to the front for a
    re-check."""
    import glob
    import json
    import os

    names = set(_DRIVER_VERIFIED)
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            checks = [
                row.get(k)
                for k in ("rows_match", "schema_match", "hash_match")
                if row.get(k) is not None
            ]
            if checks and all(checks):
                names.add(name)
    return frozenset(names)


def _reorder_unverified_first() -> None:
    # Within the unseen group, oracle-paired queries go first: if the
    # driver's budget truncates, what falls off is a rows-only entry
    # (whose driver row is the weaker signal and which always has a
    # dedicated pytest) rather than a hash-checked one.
    verified = _driver_verified_names()
    front = sorted(
        (k for k in QUERIES if k not in verified),
        key=lambda k: (k not in ORACLE, list(QUERIES).index(k)),
    )
    back = [k for k in QUERIES if k in verified]
    for mapping in (QUERIES, ORACLE):
        ordered = {k: mapping[k] for k in front + back if k in mapping}
        mapping.clear()
        mapping.update(ordered)


_load_all()
_reorder_unverified_first()
