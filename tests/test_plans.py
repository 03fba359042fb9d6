"""Physical-plan assertions: lock in the 100 TB-relevant plan shapes.

Correctness tests can stay green while a plan silently degrades (a
lost pushdown, a broadcast that became a shuffle, a rank pushdown
that stopped firing). These tests pin the properties that matter at
scale, so a regression fails loudly in CI rather than at hour five of
a production run.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES


def _formatted(spark, name, sf):
    df = QUERIES[name](spark, sf)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    plan = _formatted(spark, "star_pricing_summary", sf_smoke)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # column pruning: the scan must not read unused lineitem columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_window_block_single_exchange(spark, sf_smoke):
    """All 8 rolling-feature expressions share ONE exchange + sort."""
    plan = _formatted(spark, "ref_rolling_features", sf_smoke)
    tree = plan.split("\n\n")[0]  # the operator tree, before node details
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Window") == 1, tree
    assert tree.count("Sort") == 1, tree


def test_topk_uses_window_group_limit(spark, sf_smoke):
    for name in (
        "star_topk_per_segment",
        "datapipe_cosine_topk",
        "datapipe_weighted_sample_stratified",
    ):
        assert "WindowGroupLimit" in _formatted(spark, name, sf_smoke), name


def test_unpartitioned_rank_windows_are_group_limited(spark, sf_smoke):
    """The two UNPARTITIONED rank<=k windows (count-min heavy hitters,
    A-Res weighted sample) are only scale-safe because Catalyst caps
    the input to the single-partition Window: either WindowGroupLimit
    (per-partition rank pre-filter) or — the shape Spark 4 actually
    plans here — LimitPushDownThroughWindow rewriting the filter to a
    TakeOrderedAndProject feeding the Window, so only k rows ever
    reach the single task. If a Spark upgrade or expression change
    drops both, these become full-corpus single-task sorts; fail here
    instead of at 100 TB."""
    for name in ("datapipe_countmin_heavy_hitters", "datapipe_weighted_sample"):
        tree = _formatted(spark, name, sf_smoke).split("\n\n")[0]
        assert (
            "WindowGroupLimit" in tree or "TakeOrderedAndProject" in tree
        ), f"{name} plans an uncapped single-task global sort:\n{tree}"
        # the cap must sit BELOW the Window (feeding it), not above
        if "TakeOrderedAndProject" in tree and "Window" in tree:
            assert tree.index("Window") < tree.index(
                "TakeOrderedAndProject"
            ), f"{name}: TakeOrderedAndProject must feed the Window\n{tree}"


def test_dimension_joins_are_broadcast(spark, sf_smoke):
    plan = _formatted(spark, "star_revenue_by_nation", sf_smoke)
    assert plan.count("BroadcastExchange") >= 3  # cust, nation, region


def test_pandas_udf_is_arrow_vectorized(spark, sf_smoke):
    plan = _formatted(spark, "mlops_score_pandas_udf", sf_smoke)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # the row-pickling path


def test_global_topn_is_take_ordered(spark, sf_smoke):
    """orderBy+limit must plan as TakeOrderedAndProject, not a full
    global sort feeding a limit."""
    plan = _formatted(spark, "ref_order_limit", sf_smoke)
    assert "TakeOrderedAndProject" in plan


def test_scorer_column_path_is_pure_codegen(spark, sf_smoke):
    """The JVM scoring expression must involve no Python evaluation."""
    plan = _formatted(spark, "mlops_score_column_expr", sf_smoke)
    assert "EvalPython" not in plan
    # formatted mode marks whole-stage-codegen operators with '* '
    assert "* Project" in plan


@pytest.mark.parametrize(
    "name",
    ["datapipe_neardup_clusters", "datapipe_neardup_pairs",
     "datapipe_cosine_neardup"],
)
def test_neardup_plans_have_no_cartesian(spark, sf_smoke, name):
    """Candidate generation is bucket-local: no cartesian product may
    appear in any near-dup plan."""
    plan = _formatted(spark, name, sf_smoke)
    assert "CartesianProduct" not in plan, name


def test_sliding_window_is_expand_plus_one_aggregate(spark, sf_smoke):
    """F.window(7d, 1d) must plan as the internal row expansion + ONE
    hash-aggregate pair (partial + final, a single Exchange) — never a
    self-join of 7 daily aggregates."""
    plan = _formatted(spark, "ref_sliding_window_daily", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Expand" in tree or "Generate" in tree, tree
    assert "Join" not in tree, tree
    assert tree.count("Exchange") == 1, tree


def test_frame_sample_is_shuffle_free(spark, sf_smoke):
    """Frame sampling is pure map-side work: explode with bounded
    fan-out, no Exchange anywhere in the plan."""
    plan = _formatted(spark, "datapipe_frame_sample", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Generate" in tree, tree  # the explode


def test_forest_scoring_is_arrow_vectorized(spark, sf_smoke):
    """The broadcast-forest scorer must be ArrowEvalPython (vectorized
    batches), never the row-pickling BatchEvalPython."""
    plan = _formatted(spark, "mlops_gbt_score", sf_smoke)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_ivf_assignment_stays_jvm_side(spark, sf_smoke):
    """IVF cell assignment is a JVM expression over broadcast probes:
    no Python evaluator and no cartesian product in the plan."""
    plan = _formatted(spark, "datapipe_knn_ivf", sf_smoke)
    assert "EvalPython" not in plan  # neither Arrow nor Batch
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # probes + query vectors


def test_partitioned_read_prunes_partitions(spark, sf_smoke):
    """The partitioned-layout re-read must prune at the directory
    level: the event_type filter appears in PartitionFilters (not just
    PushedFilters), so non-matching partitions are never listed."""
    from big_data_backblaze_hard_drive_failure_spark.plans.io import (
        _partitioned_events,
    )

    df = _partitioned_events(spark, sf_smoke).filter(
        F.col("event_type") == "error"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_type" in seg, f"partition filter missing: {seg}"


def test_bloom_runtime_filter_on_shuffle_join(spark, sf_smoke):
    """Runtime bloom-filter join pruning: when a selective filter sits
    on one side of a SHUFFLE join, Spark can build a bloom filter from
    that side and inject a ``might_contain`` predicate into the other
    side's scan — rows that can't join die before the exchange. At
    100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~1% that survives. (Broadcast joins don't
    need it — the small side itself prunes — so the test pins the
    shuffle-join path with broadcast disabled.)"""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        urgent = load(spark, sf_smoke, "orders").filter(
            "o_orderpriority = '1-URGENT' "
            "AND o_orderdate >= TIMESTAMP '1999-01-01'"
        )
        li = load(spark, sf_smoke, "lineitem")
        j = (
            li.join(urgent, li.l_orderkey == urgent.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q06_filters_pushed_to_scan(spark, sf_smoke):
    """The canonical pushdown probe (TPC-H Q6): the shipdate range and
    quantity bound must reach the parquet reader as PushedFilters, and
    the scan must read only the four referenced lineitem columns."""
    plan = _formatted(spark, "tpch_q06_revenue_change", sf_smoke)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    read_schema = plan.split("ReadSchema")[1][:400]
    for col in ("l_shipdate", "l_quantity", "l_extendedprice", "l_discount"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema
    assert "l_tax" not in read_schema


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling — the no-code-change alternative to
    manual salting (operators/skew.py): one hot key carrying ~2/3 of
    the left side is detected at runtime from shuffle stats and split
    across multiple tasks; the executed plan marks the join skew=true
    and the shuffle read 'coalesced and skewed'. Thresholds are
    lowered to make a local fixture register as skewed; at real scale
    the defaults (256MB partition threshold) do the same job."""
    overrides = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300000).select(
            F.when(F.col("id") < 200000, 0)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.sum("v"), F.sum("w"))
        j.collect()  # AQE decisions only exist after execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_control_physical_operator(spark):
    """Join-strategy hints are the per-query override when the
    optimizer's default is wrong for a known workload: each hint must
    actually flip the physical join operator (a hint that silently
    no-ops is worse than none)."""
    left = spark.range(100000).selectExpr("id AS k", "id AS v")
    right = spark.range(1000).selectExpr("id AS k", "id*2 AS w")
    for hint, node in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        plan = (
            left.join(right.hint(hint), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert node in plan, f"hint {hint}: expected {node}\n{plan[:800]}"


@pytest.mark.parametrize(
    "name",
    [
        "star_gini_spend",
        "mlops_mann_whitney_u",
        "mlops_kaplan_meier",
        "mlops_pr_curve",
        "mlops_logrank_test",
    ],
)
def test_rank_statistics_use_range_partitioned_prefix(spark, sf_smoke, name):
    """Gini / Mann-Whitney / Kaplan-Meier / PR curve / logrank must
    compute rank statistics through the distributed prefix-sum
    (literal bucket boundaries + per-bucket local scans + K-row offset
    table), never a data-sized unpartitioned window: the plan must
    partition on the bucket id, and any Window ordered over the data
    must be partitioned (the only unpartitioned windows allowed are
    the K-row offset frames, which sort by the synthetic bucket id,
    not a data column)."""
    plan = _formatted(spark, name, sf_smoke)
    assert "__prefix_pid" in plan, name
    # every Window in these plans is part of the prefix-sum machinery:
    # either the per-partition local scan (PARTITION BY __prefix_pid)
    # or the K-row offsets frame (ORDER BY __prefix_pid) — a window
    # spec NOT mentioning the synthetic pid would be a data-sized
    # unpartitioned window sneaking back in
    bad = [
        line.strip()[:160]
        for line in plan.split("\n")
        if "windowspecdefinition" in line and "__prefix_pid" not in line
    ]
    assert not bad, f"{name}: non-prefix-sum window(s): {bad}"


def test_pmi_pairs_are_generated_map_side(spark, sf_smoke):
    """PMI pair generation is a nested array transform in the scan
    stage: no join may appear before the pair aggregation — the only
    joins in the plan attach the tiny marginal/total frames."""
    plan = _formatted(spark, "datapipe_pmi_cooccurrence", sf_smoke)
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # explode of the transform output


def test_random_projection_is_shuffle_free(spark, sf_smoke):
    """The JL projection is compile-time-unrolled arithmetic over the
    embedding column: a pure map plan — no Exchange, no Python."""
    plan = _formatted(spark, "datapipe_random_projection", sf_smoke)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_salted_null_safe_join_shape(spark, sf_smoke):
    """The salted twin must demonstrate the at-scale shape its
    docstring promises: a plain equi-join over hash exchanges on the
    SALTED key (ShuffledHashJoin via the hint), with NO null-safe
    (EqualNullSafe) comparison left anywhere — a <=> hash join is the
    single-partition null bucket the twin exists to avoid."""
    plan = _formatted(spark, "star_null_safe_join_salted", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "ShuffledHashJoin" in tree, tree
    assert "EqualNullSafe" not in plan


def test_pareto_frontier_is_windows_not_pairs(spark, sf_smoke):
    """The skyline must be the two-window rewrite, not the quadratic
    NOT-EXISTS the oracle states: no join of part against itself."""
    plan = _formatted(spark, "star_pareto_frontier", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
              "BroadcastNestedLoopJoin"):
        assert j not in tree, f"skyline planned a pair join: {tree}"


def test_triangle_count_reuses_staged_edges(spark, sf_smoke):
    """Triangle counting consumes the edge list and oriented edges
    from stage boundaries: the lineitem self-join that BUILDS edges
    must appear once (InMemoryRelation reuse), not once per wedge
    branch."""
    plan = _formatted(spark, "star_triangle_count", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in tree or "TableCacheQueryStage" in tree, tree


def test_propensity_match_parallelism(spark, sf_smoke):
    """The round-8 verdict's parallelism cliff, pinned fixed: the
    as-of match's ROW-frame window must partition by (stratum,
    score-range bucket) — never by the 24-value hour stratum alone —
    and the bucket key must actually multiply the partition count
    past 24 on real data. The tiny carry window (partitionBy stratum
    over the O(strata x buckets) bucket frame) is the documented
    bounded-frame exception in test_plan_hygiene."""
    import re

    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    plan = _formatted(spark, "mlops_propensity_match", sf_smoke)
    m = re.search(r"AS mc_local#\d+\], \[([^\]]*)\]", plan)
    assert m, plan
    keys = m.group(1)
    assert "stratum#" in keys and "bucket#" in keys, (
        f"row-frame window partitions by [{keys}] — the score-range "
        "bucket is gone, parallelism is capped at 24 strata again"
    )
    # data evidence: the composite key's cardinality beats the stratum's
    n = (
        load(spark, sf_smoke, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("props").isNotNull()
            & F.col("event_type").isin("view", "purchase")
        )
        .select(
            F.hour("ts").alias("stratum"),
            F.floor(F.col("value") / F.lit(2.0)).alias("bucket"),
        )
        .distinct()
        .count()
    )
    assert n > 24, f"(stratum, bucket) cardinality {n} <= 24 strata"


def test_sorted_write_is_range_exchange_plus_local_sort(spark, sf_smoke):
    """The terasort layout behind io_sorted_write_audit: ONE range
    exchange (sampled split points, disjoint key ranges) feeding a
    NON-GLOBAL sort (the Sort node's global flag is false) — never a
    single-reducer global ORDER BY. The audit query verifies the
    written invariants as data; this pins the write-side plan."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    df = (
        load(spark, sf_smoke, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(8, "o_totalprice", "o_orderkey")
        .sortWithinPartitions("o_totalprice", "o_orderkey")
    )
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = je.explainString(mode)
    assert "rangepartitioning(o_totalprice" in plan, plan
    # the sort is per-partition: 'Arguments: [...ASC NULLS FIRST], false, 0'
    sort_args = [
        l for l in plan.split("\n")
        if "Arguments: [o_totalprice" in l and "ASC" in l
    ]
    assert sort_args and all(", false, 0" in l for l in sort_args), (
        "sortWithinPartitions planned a GLOBAL sort:\n" + plan
    )


def test_doc_chunking_is_pure_map(spark, sf_smoke):
    """RAG chunking (64-token windows, 48 stride) is compile-time
    sequence() + clamped slice over each doc: pure map-side at any
    scale — no Exchange may appear, and the chunk fan-out is one
    Generate (the explode of chunk starts), never a join or window."""
    plan = _formatted(spark, "datapipe_doc_chunking", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Generate" in tree, tree
    assert "Join" not in tree and "Window" not in tree, tree


def test_autocorrelation_scans_orders_once(spark, sf_smoke):
    """The ACF's lag self-join must consume ONE staged daily frame
    (InMemoryRelation reuse) — unstaged, Catalyst re-derives the
    daily aggregate per side, i.e. two full scans of orders at
    100 TB for an O(days) calendar-bounded frame. The 7-row lag
    table must arrive broadcast (BroadcastExchange under the
    fan-out join), never shuffled."""
    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )

    import re

    release_stage_boundaries()
    try:
        plan = _formatted(spark, "star_autocorrelation", sf_smoke)
        tree = plan.split("\n\n")[0]
        # formatted mode prints the cached subtree under EACH
        # InMemoryTableScan, so count DISTINCT scan node ids: one id
        # repeated = one shared cache build; two ids = two real scans
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))
        assert len(scan_ids) == 1, (
            f"daily frame not shared — {len(scan_ids)} distinct "
            f"parquet scans of orders:\n{tree}"
        )
        assert (
            "InMemoryTableScan" in tree or "TableCacheQueryStage" in tree
        ), tree
        assert "BroadcastExchange" in tree, tree
    finally:
        release_stage_boundaries()


def test_unigram_vocab_join_survives_without_broadcast(spark, sf_smoke):
    """The unbounded-vocab contract, REVISED in round 10: the
    token-stream ⋈ vocab join now carries an explicit
    hint("shuffle_hash"). The original contract ("deliberately
    unhinted so AQE sizes it") was falsified by the round-10 sf1 plan
    sweep — the STATIC planner broadcast the vocab aggregate from its
    post-explode underestimate, and a static broadcast builds eagerly
    (AQE can upgrade a shuffle to broadcast from runtime stats, but
    cannot demote an already-chosen broadcast). Pin by planning under
    autoBroadcastJoinThreshold=-1: the vocab join must be a shuffle
    join (SortMergeJoin/ShuffledHashJoin), while the 1-row
    corpus-total side stays broadcast (its explicit F.broadcast hint
    survives the threshold). If someone 'optimizes' the vocab join
    with a broadcast hint, this fails — that hint OOMs the driver on
    a real web corpus's vocabulary."""
    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )

    release_stage_boundaries()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted(spark, "datapipe_unigram_logprob", sf_smoke)
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, (
            "vocab join did not fall back to a shuffle join under "
            "threshold=-1 — an explicit broadcast hint crept in:\n" + tree
        )
        assert "BroadcastNestedLoopJoin" in tree, (
            "the 1-row corpus-total crossJoin lost its explicit "
            "broadcast hint:\n" + tree
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        release_stage_boundaries()


def test_fact_fact_joins_are_merge_pinned(spark, sf_smoke):
    """Round-10 sf1 regression pins: three queries statically planned a
    BroadcastHashJoin whose build side SCALES with the data (Catalyst's
    column-pruned / post-explode size estimates come out under the
    threshold), and the eager broadcast build OOM'd at sf1 before AQE
    could demote it. The fix is an explicit hint(\"merge\") on each
    fact-fact join: SMJ spills, broadcast builds don't. These pins
    fail if anyone drops the hints.

    - tpch_q18: orders join filtered-lineitem-agg must sort-merge
    - tpch_q21: lineitem join orders must sort-merge
    - datapipe_jaccard_prefix_join: all four unbounded-side joins
      (token-stream x freq, prefix x prefix, verify x2) must be
      shuffle joins (SMJ for the symmetric prefix join, SHJ where one
      side is structurally small) — no BroadcastHashJoin anywhere
    """
    import re

    def physical(name):
        df = QUERIES[name](spark, sf_smoke)
        return df._jdf.queryExecution().executedPlan().toString()

    tree = physical("tpch_q18_large_volume_customer")
    assert re.search(
        r"SortMergeJoin \[o_orderkey#\d+L?\], \[l_orderkey#\d+L?\]", tree
    ), "q18 orders-big join lost its merge hint:\n" + tree

    tree = physical("tpch_q21_waiting_suppliers")
    assert re.search(
        r"SortMergeJoin \[l_orderkey#\d+L?\], \[o_orderkey#\d+L?\]", tree
    ), "q21 lineitem-orders join lost its merge hint:\n" + tree

    tree = physical("datapipe_jaccard_prefix_join")
    assert "BroadcastHashJoin" not in tree, (
        "jaccard_prefix_join plans a broadcast join — an unbounded "
        "side lost its shuffle hint:\n" + tree
    )
    assert (
        tree.count("SortMergeJoin") + tree.count("ShuffledHashJoin") >= 4
    ), "jaccard_prefix_join expected 4 shuffle-hinted joins:\n" + tree


@pytest.mark.parametrize(
    "name,keys_re",
    [
        # (neardup_pairs / neardup_editdist left this list in round 11:
        # their small-bucket self-joins were REPLACED by the bounded
        # per-bucket array explosion — see
        # test_neardup_candidates_are_joinless)
        # incremental dedup: the banded OLD corpus accumulates forever
        ("datapipe_incremental_neardup", r"ShuffledHashJoin \[band_id#\d+, band_key#\d+\]"),
        # (star_sequential_pattern left this list in round 11: its
        # user_id self-join was REPLACED by the bounded per-user
        # array explosion — see test_sequential_pattern_is_joinless)
        # (stratum, score-bucket) carries: bucket count grows with the
        # score DOMAIN, not a literal
        ("mlops_propensity_match", r"ShuffledHashJoin \[stratum#\d+, bucket#\d+L?\]"),
    ],
)
def test_round11_scaling_frame_joins_are_shuffle_hinted(
    spark, sf_smoke, name, keys_re
):
    """Round-11 sf1 regression pins: five queries statically planned a
    BroadcastHashJoin of a corpus-scaling SortAggregate-keyed frame —
    invisible to the round-10 audit because SortAggregate prints
    ``key=[...]`` where HashAggregate prints ``keys=[...]`` (the
    struct-min/max tie-break idiom forces sort-based aggregation).
    Each got an explicit hint("shuffle_hash") on the scaling side; a
    hinted shuffle stays AQE-upgradable to broadcast from accurate
    runtime stats, an eagerly-built static broadcast cannot be
    demoted and OOMs at scale (the q18/q21/jaccard class). Planned
    under autoBroadcastJoinThreshold=-1 the hinted join MUST be a
    ShuffledHashJoin on the expected keys — if the hint is dropped,
    Catalyst falls back to SortMergeJoin and this pin fails before the
    sf1 audit would."""
    import re

    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )

    release_stage_boundaries()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tree = (
            QUERIES[name](spark, sf_smoke)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert re.search(keys_re, tree), (
            f"{name}: expected a shuffle_hash-hinted join matching "
            f"{keys_re!r} under threshold=-1 — the round-11 safety hint "
            "was dropped:\n" + tree
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        release_stage_boundaries()


def test_sequential_pattern_is_joinless(spark, sf_smoke):
    """Round-11 rewrite pin: the per-user pair space is a bounded
    array explosion (collect_list of <= |event-type enum| structs,
    two Generates), NOT a self-join — there must be no equi-join of
    the per-user frame anywhere in the plan (the shape the static
    planner mis-broadcast at sf1), the two Generates must be present,
    and the staged per-user frame must be cache-reused by the
    user-count branch (one events scan, not two)."""
    import re

    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )

    release_stage_boundaries()
    try:
        plan = _formatted(spark, "star_sequential_pattern", sf_smoke)
        tree = plan.split("\n\n")[0]
        assert tree.count("Generate") >= 2, tree
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
            assert j not in tree, (
                f"{j} crept back into the pair space:\n" + tree
            )
        # the only join is the 1-row n_users broadcast recombine
        assert "BroadcastNestedLoopJoin" in tree, tree
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))
        assert len(scan_ids) == 1, (
            f"per-user frame not shared — {len(scan_ids)} distinct "
            f"events scans:\n{tree}"
        )
    finally:
        release_stage_boundaries()


def test_cooccurrence_baskets_is_joinless_single_scan(spark, sf_smoke):
    """Round-11 rewrite pin: basket co-occurrence is collect_set per
    (user, day) + double explode — ONE events scan, ONE shuffle, no
    join anywhere (the old shape was distinct() + a merge self-join:
    two scans, three exchanges, and a fact-fact SMJ to mis-plan)."""
    import re

    plan = _formatted(spark, "star_cooccurrence_baskets", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, tree
    assert tree.count("Generate") >= 2, tree
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree


@pytest.mark.parametrize(
    "name", ["datapipe_neardup_pairs", "datapipe_neardup_editdist"]
)
def test_neardup_candidates_are_joinless(spark, sf_smoke, name):
    """Round-11 rewrite pin: LSH candidate generation is collect_set
    per (band_id, band_key) + double explode — the 2..cap gate bounds
    the per-bucket array BY CONSTRUCTION, so no bucket-count Window
    and no self-join exist for the static planner to mis-broadcast
    (the SortAggregate key= audit class). The only joins allowed are
    the two verification lookups against the documents token/prefix
    frames."""
    plan = _formatted(spark, name, sf_smoke)
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") >= 2, tree
    assert "Window" not in tree, (
        "the bucket-count window is back:\n" + tree
    )
    n_joins = sum(tree.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin",
                   "BroadcastHashJoin", "BroadcastNestedLoopJoin"))
    assert n_joins == 2, (
        f"{name}: expected exactly the two verification joins, "
        f"found {n_joins}:\n" + tree
    )


def test_q21_exists_is_per_order_array(spark, sf_smoke):
    """Round-12 rewrite pin (the bounded-group class, found by the
    self-join sweep): q21's EXISTS / NOT EXISTS are map-side
    predicates over a per-order collect_list (<= 7 structs, TPC-H
    data model) — no left-semi / left-anti self-joins of the fact
    table remain, lineitem is scanned exactly twice (l1 build +
    per-order roster), the join-back is a merge-hinted SortMergeJoin
    (roster rows drag arrays and SHJ hash builds don't spill — the
    shuffle_hash variant OOM'd at sf1; a statically-broadcast
    corpus-scaling aggregate is likewise the q18/q21/jaccard OOM
    class), and the l1-orders merge pin still holds."""
    import re

    plan = _formatted(spark, "tpch_q21_waiting_suppliers", sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "LeftSemi" not in tree and "LeftAnti" not in tree, (
        "the semi/anti self-joins are back:\n" + tree
    )
    assert "BroadcastHashJoin" not in tree.split("Scan parquet")[0] or (
        tree.count("BroadcastHashJoin") == 1
    ), "unexpected extra broadcast join:\n" + tree
    # TWO SortMergeJoins: l1's merge-pinned orders join AND the
    # roster join-back (merge, not shuffle_hash: roster rows drag
    # arrays and SHJ builds don't spill — the jaccard verify-join
    # contract; the shuffle_hash variant OOM'd at sf1)
    assert tree.count("SortMergeJoin") == 2, (
        "expected 2 merge joins (l1-orders + roster join-back):\n" + tree
    )
    # the tree section names no file paths; total scans = lineitem x2
    # (l1 + roster) + orders + supplier — the old semi/anti plan had 5
    n_scans = len(re.findall(r"Scan parquet", tree))
    assert n_scans == 4, (
        f"expected 4 scans (lineitem x2, orders, supplier), found "
        f"{n_scans}:\n" + tree
    )


@pytest.mark.parametrize(
    "name", ["star_touch_attribution", "star_conversion_latency"]
)
def test_touch_attribution_is_joinless_window(spark, sf_smoke, name):
    """Round-12 rewrite pin (self-join sweep catch #2): 24h-window
    attribution is a RANGE-frame window over the user-partitioned
    event stream — one scan, one shuffle, a single Window node, and
    NO join: the old (purchase x click) interval self-join enumerated
    every candidate pair through two shuffles and an SMJ range
    residual."""
    import re

    plan = _formatted(spark, name, sf_smoke)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, "the interval self-join is back:\n" + tree
    assert tree.count("Window") == 1, (
        "expected exactly one Window node (shared frame):\n" + tree
    )
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree


def test_cohort_retention_is_joinless_window(spark, sf_smoke):
    """Round-12 rewrite pin (self-join sweep catch #3): the per-user
    cohort week is min(week) over (partition by user_id) — one events
    scan, no join (the old shape was groupBy(user).min joined back:
    two scans, a shuffle-hinted O(users) join, three exchanges)."""
    import re

    tree = _formatted(spark, "star_cohort_retention", sf_smoke).split(
        "\n\n"
    )[0]
    assert "Join" not in tree, "the cohort join-back is back:\n" + tree
    assert tree.count("Window") == 1, tree
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree


def test_q17_per_part_stats_are_windowed(spark, sf_smoke):
    """Round-12 rewrite pin (self-join sweep catch #4): q17's per-part
    sum/cnt are window aggregates over the Brand#3-FILTERED stream —
    one lineitem scan (the old aggregate-join-back scanned lineitem
    twice and aggregated every part, 25x more than the brand filter
    keeps), one broadcast part join, a single shared Window node."""
    import re

    tree = _formatted(
        spark, "tpch_q17_small_qty_revenue", sf_smoke
    ).split("\n\n")[0]
    assert tree.count("Window") == 1, tree
    n_scans = len(re.findall(r"Scan parquet", tree))
    assert n_scans == 2, (
        f"expected 2 scans (lineitem + part), found {n_scans}:\n" + tree
    )
    assert "BroadcastHashJoin" in tree, tree
    n_shuffle_joins = tree.count("SortMergeJoin") + tree.count(
        "ShuffledHashJoin"
    )
    assert n_shuffle_joins == 0, (
        "the per-part aggregate join-back is back:\n" + tree
    )
