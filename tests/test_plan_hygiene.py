"""Global plan-hygiene gate over the ENTIRE query registry.

test_plans.py pins specific good shapes on representative queries;
this sweep enforces the universal negatives on every registered query
at once, so no future query can silently introduce the two
scale-killers:

  * ``CartesianProduct`` — an unconditioned all-pairs join. Every
    similarity/near-dup operator must go through hash buckets or an
    explicit broadcast (broadcast nested-loop over a bounded side is
    acceptable and asserted separately per-query).
  * ``BatchEvalPython`` — the row-pickling Python UDF path. Python is
    crossed Arrow-batched only (ArrowEvalPython / mapInPandas /
    applyInPandas), never per-row.
"""

from __future__ import annotations

import pytest

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES


def _tree(spark, name, sf):
    from tests.test_plans import _formatted  # single plan-extraction impl

    return _formatted(spark, name, sf).split("\n\n")[0]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python(spark, sf_smoke, name):
    tree = _tree(spark, name, sf_smoke)
    assert "CartesianProduct" not in tree, f"{name} plans an all-pairs join"
    assert "BatchEvalPython" not in tree, f"{name} uses a row-pickling UDF"


# Per-table rescan budget. Catalyst does not materialize common
# subplans: a frame consumed by N sibling branches appears N times in
# the physical plan, and each occurrence is a full corpus pass at
# 100 TB. Shapes that legitimately reach 3-4 scans exist (NOT-EXISTS
# twins like tpch_q21 re-probe lineitem; incremental-vs-corpus dedup
# reads the corpus as both sides), so the budget is 4; anything above
# means a missing operators.staging.stage_boundary on a shared frame
# (mlops_kaplan_meier hit TWELVE events scans before its boundary;
# the sweep that found it is the scan audit this test now pins).
_RESCAN_BUDGET = 4


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_table_rescan_budget(spark, sf_smoke, name):
    import re
    from collections import Counter

    from tests.test_plans import _formatted

    plan = _formatted(spark, name, sf_smoke)
    scans = Counter(re.findall(r"file:[^\s\]]*?/(\w+)\.parquet", plan))
    worst = {t: n for t, n in scans.items() if n > _RESCAN_BUDGET}
    assert not worst, (
        f"{name} scans {worst} times in one plan — add a stage_boundary "
        "on the shared frame (each extra scan is a full corpus pass)"
    )


# ---------------------------------------------------------------------
# Constant-cardinality window partitions — the fifth scale-killer
# class (the round-8 verdict's one slip): a Window partitioned ONLY by
# data-independent bounded keys (hour -> 24, month -> 12, a boolean
# flag -> 2, pmod(hash, k) -> k) caps the stage's parallelism at that
# constant forever, so at 100x the data every partition's whole
# population sorts in one task. The sweep walks each ANALYZED logical
# plan (pre cache-substitution, so windows behind stage_boundary
# persists are still visible), resolves window partition keys through
# their defining Aliases, and flags any window whose every key is
# bounded. Allowlisted names must document why the window's INPUT
# frame is itself bounded (a calendar spine, a bucket frame), making
# the tiny partition count harmless.
# ---------------------------------------------------------------------

# expression is bounded if it's a calendar extract (<=366 values), a
# literal, a boolean, or pmod(_, literal)
import re as _re

_BOUNDED_SQL = _re.compile(
    r"^(CAST\()*\s*(hour|minute|second|month|quarter|dayofweek|weekday|"
    r"dayofmonth|dayofyear|weekofyear|year|date_part|extract)\s*\(",
    _re.IGNORECASE,
)
_BOUNDED_PMOD = _re.compile(r"^pmod\(.*,\s*\d+\s*\)$", _re.IGNORECASE)

# window runs over a bounded input frame; the constant partition
# count is the frame's own cardinality, not a parallelism cap. Maps
# name -> the EXACT expected offender key lists, so the allowlist
# can't silently absorb a new unrelated constant-key window.
_BOUNDED_FRAME_ALLOWLIST = {
    # carry window over the O(strata x buckets) bucket-boundary frame
    # (plans/mlops.py propensity two-level hand-off) — the ROW frame's
    # window partitions by (stratum, bucket), which this sweep accepts
    "mlops_propensity_match": [["stratum"]],
}


def _walk_plan(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _collect_aliases(plan):
    """exprId -> (sql, dtype, class) for every top-level Alias in any
    node's named expressions (enough to resolve window keys one or
    more Project hops down)."""
    aliases = {}
    for n in _walk_plan(plan):
        try:
            exprs = n.expressions()
        except Exception:
            continue
        for i in range(exprs.size()):
            e = exprs.apply(i)
            if e.getClass().getSimpleName() == "Alias":
                ch = e.child()
                aliases[e.exprId().id()] = (
                    ch.sql(),
                    ch.dataType().simpleString(),
                    ch.getClass().getSimpleName(),
                )
    return aliases


def _is_bounded(sql, dtype, cls, aliases, eid, depth=0):
    if dtype == "boolean" or cls == "Literal":
        return True
    if _BOUNDED_SQL.match(sql) or _BOUNDED_PMOD.match(sql):
        return True
    if cls == "AttributeReference" and eid in aliases and depth < 5:
        s, d, c = aliases[eid]
        return _is_bounded(s, d, c, aliases, None, depth + 1)
    return False


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_constant_cardinality_window_partitions(spark, sf_smoke, name):
    plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().analyzed()
    aliases = _collect_aliases(plan)
    offenders = []
    for n in _walk_plan(plan):
        if n.getClass().getSimpleName() != "Window":
            continue
        ps = n.partitionSpec()
        keys = []
        for i in range(ps.size()):
            e = ps.apply(i)
            keys.append(
                (
                    e.sql(),
                    e.dataType().simpleString(),
                    e.getClass().getSimpleName(),
                    e.exprId().id()
                    if e.getClass().getSimpleName() == "AttributeReference"
                    else None,
                )
            )
        # empty spec = global window, covered by the group-limit pins
        if keys and all(
            _is_bounded(s, d, c, aliases, eid) for (s, d, c, eid) in keys
        ):
            offenders.append([s for (s, d, c, eid) in keys])
    if name in _BOUNDED_FRAME_ALLOWLIST:
        assert offenders == _BOUNDED_FRAME_ALLOWLIST[name], (
            f"{name}'s allowlisted bounded-frame windows changed "
            f"({offenders} != {_BOUNDED_FRAME_ALLOWLIST[name]}) — "
            "re-audit the bounded-input-frame justification"
        )
        return
    assert not offenders, (
        f"{name} partitions a Window by constant-cardinality keys "
        f"{offenders}: parallelism is capped at that constant at any "
        "data size — add a data-dependent sub-bucket (the propensity "
        "two-level hand-off) or allowlist with a bounded-frame note"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_paired_schemas_are_scalar(spark, sf_smoke, name):
    """Driver-gate compatibility: the correctness harness canonicalizes
    results with a pandas sort/hash that cannot order top-level
    ArrayType/MapType cells (``TypeError: unhashable type: 'list'`` —
    the round-5 datapipe_embedding_quantize / datapipe_video_frame_decode
    driver crash). Round 7 proved the driver canonicalizes rows-only
    output too (star_approx_percentiles crashed its harness with no
    oracle attached), so EVERY registered query must emit scalar
    columns only; encode vectors as CSV strings (array_join), explode
    them, or unpack with element_at."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in QUERIES[name](spark, sf_smoke).schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} emits non-scalar top-level column(s) {bad}: the driver's "
        "pandas canonicalizer crashes on them — array_join/explode instead"
    )


def test_window_partition_sweep_catches_planted_offender(spark, sf_smoke):
    """Meta-test: the constant-cardinality sweep must FLAG a window
    partitioned by hour(ts) alone and PASS one that adds a
    data-dependent key — otherwise the sweep can silently weaken into
    a no-op (e.g. if alias resolution breaks on a Spark upgrade)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events")

    def offenders_of(df):
        plan = df._jdf.queryExecution().analyzed()
        aliases = _collect_aliases(plan)
        found = []
        for n in _walk_plan(plan):
            if n.getClass().getSimpleName() != "Window":
                continue
            ps = n.partitionSpec()
            keys = []
            for i in range(ps.size()):
                e = ps.apply(i)
                keys.append(
                    (
                        e.sql(),
                        e.dataType().simpleString(),
                        e.getClass().getSimpleName(),
                        e.exprId().id()
                        if e.getClass().getSimpleName()
                        == "AttributeReference"
                        else None,
                    )
                )
            if keys and all(
                _is_bounded(s, d, c, aliases, eid)
                for (s, d, c, eid) in keys
            ):
                found.append([s for (s, d, c, eid) in keys])
        return found

    bad = ev.withColumn("h", F.hour("ts")).withColumn(
        "r", F.sum("value").over(Window.partitionBy("h").orderBy("event_id"))
    )
    assert offenders_of(bad) == [["h"]], "sweep failed to flag hour(ts)"
    ok = ev.withColumn("h", F.hour("ts")).withColumn(
        "r",
        F.sum("value").over(
            Window.partitionBy("h", "user_id").orderBy("event_id")
        ),
    )
    assert offenders_of(ok) == [], "sweep flagged a mixed-key window"


# ---------------------------------------------------------------------
# Long-typed products of unbounded aggregates — the sixth
# scale-killer class, found EMPIRICALLY by the round-10 sf1 parity
# rotation: mlops_value_error_corr's n * sum(cents^2) hit
# ARITHMETIC_OVERFLOW at sf1 (~5.6e23 >> 2^63) after its docstring
# claimed the bound held. The sf0.01 driver gate and sf0.1 parity log
# are structurally blind to this class; this sweep is its static
# twin: walk every ANALYZED plan and flag any bigint Multiply whose
# BOTH operands derive (through alias chains) from unbounded
# aggregate outputs — Sum/Count or rank-family window functions,
# whose magnitude grows with the data. The fix idiom is widening to
# decimal(38,0) (== DuckDB HUGEINT) BEFORE the multiply, or `x * 1.0
# * y` double math where 2^-52 relative error is provably noise;
# round 10 applied it to ten plans (CUPED, Mann-Whitney, ROC-AUC,
# CUSUM, McNemar, chi-square, grouped z-score, Gini, skew profile,
# triangle wedges). Allowlisted names must document why the operands
# are bounded by construction.
# ---------------------------------------------------------------------

_UNBOUNDED_AGG_FNS = {"Sum", "Count", "RowNumber", "Rank", "DenseRank",
                      "NTile"}

# name -> EXACT sorted offender-expression list, so the allowlist
# can't silently absorb a new unrelated product
_BOUNDED_PRODUCT_ALLOWLIST = {
    # 7/14-day ROW-frame window sums: n7 <= 14 rows and sxx7 <= 14
    # max-cents^2 (~3.5e10), so every product is bounded by the frame
    # length forever — no data growth reaches 2^63
    "ref_rolling_features": [
        "(n7 * (n7 - CAST(1 AS BIGINT)))",
        "(n7 * sxx7)",
        "(sx7 * sx7)",
    ],
}


def _walk_expr(e):
    stack = [e]
    while stack:
        x = stack.pop()
        yield x
        ch = x.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _agg_product_offenders(plan):
    aliases = {}
    for n in _walk_plan(plan):
        try:
            exprs = n.expressions()
        except Exception:
            continue
        for i in range(exprs.size()):
            for x in _walk_expr(exprs.apply(i)):
                if x.getClass().getSimpleName() == "Alias":
                    aliases[x.exprId().id()] = x.child()

    def unbounded(e, depth=0):
        if depth > 6:
            return False
        for x in _walk_expr(e):
            cls = x.getClass().getSimpleName()
            if cls in _UNBOUNDED_AGG_FNS:
                return True
            if cls == "AttributeReference":
                i = x.exprId().id()
                if i in aliases and unbounded(aliases[i], depth + 1):
                    return True
        return False

    offenders = set()
    for n in _walk_plan(plan):
        try:
            exprs = n.expressions()
        except Exception:
            continue
        for i in range(exprs.size()):
            for x in _walk_expr(exprs.apply(i)):
                if x.getClass().getSimpleName() != "Multiply":
                    continue
                try:
                    if x.dataType().simpleString() != "bigint":
                        continue
                except Exception:
                    continue
                if unbounded(x.left()) and unbounded(x.right()):
                    offenders.add(x.sql())
    return sorted(offenders)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_long_products_of_unbounded_aggregates(spark, sf_smoke, name):
    plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().analyzed()
    offenders = _agg_product_offenders(plan)
    if name in _BOUNDED_PRODUCT_ALLOWLIST:
        assert offenders == _BOUNDED_PRODUCT_ALLOWLIST[name], (
            f"{name}'s allowlisted bounded products changed "
            f"({offenders} != {_BOUNDED_PRODUCT_ALLOWLIST[name]}) — "
            "re-audit the bounded-by-construction justification"
        )
        return
    assert not offenders, (
        f"{name} multiplies unbounded aggregates in 64-bit long "
        f"{offenders}: this wraps/aborts once the product passes 2^63 "
        "(the mlops_value_error_corr sf1 overflow class) — widen to "
        "decimal(38,0)/HUGEINT before the multiply, use `x * 1.0 * y` "
        "double math, or allowlist with a bounded-operand note"
    )


def test_agg_product_sweep_catches_planted_offender(spark, sf_smoke):
    """Meta-test: the sweep must FLAG a long product of two aggregate
    sums and PASS the decimal-widened rewrite — otherwise it can rot
    into a no-op (e.g. alias resolution breaking on a Spark upgrade)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("event_id")).alias("sx"),
    )
    bad = s.select((F.col("n") * F.col("sx")).alias("z"))
    good = s.select(
        (F.col("n").cast("decimal(38,0)") * F.col("sx")).alias("z")
    )
    assert _agg_product_offenders(
        bad._jdf.queryExecution().analyzed()
    ), "sweep missed a planted long product of two aggregates"
    assert not _agg_product_offenders(
        good._jdf.queryExecution().analyzed()
    ), "sweep flagged the decimal-widened rewrite"


# ---------------------------------------------------------------------
# Broadcast hints over SF-scaling scans — the seventh scale-killer
# class, found EMPIRICALLY by the round-10 sf1 parity rotation: an
# explicit F.broadcast() (ResolvedHint strategy=broadcast) is obeyed
# by the STATIC planner, and a broadcast build is executed eagerly —
# if the hinted frame scales with the data, the build OOMs before AQE
# ever sees runtime stats (tpch_q18's broadcast(customer) died
# building at sf1 in a driver-default-sized session; the asymmetry is
# that a static SORT-MERGE plan can still be UPGRADED to broadcast by
# AQE from accurate runtime stats, so the safe default for a
# maybe-small side is NO hint, not a broadcast hint). This sweep
# walks every ANALYZED plan and flags any broadcast hint whose
# subtree scans one of the six SF-scaling fixture tables with no
# Aggregate / GlobalLimit / Deduplicate making the frame's
# cardinality data-independent in between. Round 10 removed the hint
# from eleven customer joins (AQE still broadcasts customer from
# runtime stats while it fits). Limitation, by design: an Aggregate
# prunes the walk even when its GROUP keys scale (e.g. group-by
# doc_id) — grouped-unbounded broadcasts are governed by per-query
# pins (test_unigram_vocab_join_survives_without_broadcast), not this
# sweep. Allowlisted names must document why the hinted frame is
# bounded by construction.
# ---------------------------------------------------------------------

# LogicalRelation simpleString has no path; identify scaling tables by
# a signature column unique to each
_SCALING_TABLE_SIG = {
    "customer": "c_custkey#",
    "orders": "o_orderkey#",
    "lineitem": "l_orderkey#",
    "events": "event_id#",
    "documents": "doc_id#",
    "embeddings": "vec_id#",
    # supplier and part scale linearly with SF too (10/100/1k and
    # 200/2k/20k rows at sf0.001/0.01/0.1 — part at sf0.1 is BIGGER
    # than the customer table round 10 de-hinted). Omitting them hid
    # 14 eager-broadcast sites until round 12's review; only nation
    # (25) and region (5) are fixed-cardinality and may be hinted.
    "supplier": "s_suppkey#",
    "part": "p_partkey#",
}
_CARDINALITY_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "Deduplicate"}

# name -> EXACT sorted scaling-table list under a broadcast hint, so
# the allowlist can't silently absorb a new unrelated hint
_BOUNDED_BROADCAST_ALLOWLIST = {
    # the broadcast side is the QUERY-VECTOR frame: embeddings
    # filtered to a literal fixed vec_id set (<= 5 rows forever) — a
    # Filter, which this sweep cannot prove bounding. At corpus-scale
    # query sets the registered LSH/IVF variants replace the
    # broadcast, per each docstring.
    "datapipe_cosine_topk": ["embeddings"],
    "datapipe_hard_negatives": ["embeddings"],
    "datapipe_knn_ivf": ["embeddings"],
}


def _broadcast_hint_offenders(plan):
    out = set()
    stack = [(plan, False)]
    while stack:
        n, under_hint = stack.pop()
        cls = n.getClass().getSimpleName()
        if under_hint and cls in _CARDINALITY_BOUNDING_NODES:
            continue
        if cls == "ResolvedHint" and "broadcast" in str(n.hints()).lower():
            under_hint = True
        if under_hint and cls == "LogicalRelation":
            txt = n.simpleString(1000)
            for t, sig in _SCALING_TABLE_SIG.items():
                if sig in txt:
                    out.add(t)
        ch = n.children()
        for i in range(ch.size()):
            stack.append((ch.apply(i), under_hint))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_broadcast_hint_over_scaling_scan(spark, sf_smoke, name):
    plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().analyzed()
    offenders = _broadcast_hint_offenders(plan)
    if name in _BOUNDED_BROADCAST_ALLOWLIST:
        assert offenders == _BOUNDED_BROADCAST_ALLOWLIST[name], (
            f"{name}'s allowlisted bounded broadcasts changed "
            f"({offenders} != {_BOUNDED_BROADCAST_ALLOWLIST[name]}) — "
            "re-audit the bounded-by-construction justification"
        )
        return
    assert not offenders, (
        f"{name} puts an explicit broadcast hint over a scan of "
        f"SF-scaling table(s) {offenders}: the static planner obeys "
        "hints and executes broadcast builds eagerly, so this OOMs at "
        "scale before AQE can demote it (the tpch_q18 sf1 failure "
        "class) — drop the hint (AQE still broadcasts small sides "
        "from runtime stats) or allowlist with a bounded-frame note"
    )


def test_broadcast_hint_sweep_catches_planted_offender(spark, sf_smoke):
    """Meta-test: the sweep must FLAG broadcast(raw events scan) and
    PASS a broadcast over an Aggregate of it — otherwise the sweep
    can rot into a no-op (hint node class or simpleString format
    changing on a Spark upgrade)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events")
    types = ev.select("event_type").groupBy("event_type").count()
    bad = ev.join(F.broadcast(ev.select("user_id", "event_type")),
                  "event_type")
    good = ev.join(F.broadcast(types), "event_type")
    assert _broadcast_hint_offenders(
        bad._jdf.queryExecution().analyzed()
    ) == ["events"], "sweep missed a planted broadcast of a raw scan"
    assert not _broadcast_hint_offenders(
        good._jdf.queryExecution().analyzed()
    ), "sweep flagged a broadcast over an Aggregate"


def test_broadcast_hint_sweep_catches_planted_part_supplier(
    spark, sf_smoke
):
    """Meta-test for the round-13 signature-map extension: the sweep
    must FLAG broadcast(part) and broadcast(filtered supplier) — the
    exact 14-site class round 12's review found hidden because
    ``_SCALING_TABLE_SIG`` omitted the two tables (a literal
    brand/color Filter is constant selectivity over a linear table,
    NOT a cardinality bound) — and must still PASS a broadcast of a
    genuinely fixed-cardinality dimension (nation, 25 rows)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    li = load(spark, sf_smoke, "lineitem")
    part = load(spark, sf_smoke, "part")
    supp = load(spark, sf_smoke, "supplier").filter(
        F.col("s_name").contains("x")
    )
    nation = load(spark, sf_smoke, "nation")
    bad_part = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    bad_supp = li.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    good = li.join(
        F.broadcast(nation), F.col("l_suppkey") == F.col("n_nationkey")
    )
    assert _broadcast_hint_offenders(
        bad_part._jdf.queryExecution().analyzed()
    ) == ["part"], "sweep missed a planted broadcast(part)"
    assert _broadcast_hint_offenders(
        bad_supp._jdf.queryExecution().analyzed()
    ) == ["supplier"], "sweep missed a planted broadcast(filtered supplier)"
    assert not _broadcast_hint_offenders(
        good._jdf.queryExecution().analyzed()
    ), "sweep flagged broadcast(nation) — nation is fixed-cardinality"
