"""Registry-wide self-join sweep: walk the OPTIMIZED LOGICAL plan of
every registered query, list each join whose two sides read at least
one common base table, and diff the findings against the checked-in
triage allowlist (``scripts/selfjoin_allowlist.json``). An entry
missing from the allowlist is an UNTRIAGED pair-explosion risk and the
script **exits nonzero**.

Why this exists (round 12, VERDICT #4): round 11 established the
bounded-group pair-explosion rewrite class — where a per-key group is
bounded BY CONSTRUCTION (event-type enum, lineitems-per-order, the
2..16 LSH bucket gate), ``groupBy(K).agg(collect_set)`` + double
``explode`` replaces a self-join entirely: one shuffle and two
map-side Generates instead of two exchanges plus a join whose small
side the static planner size-estimates (the mechanism that OOM'd
three queries at sf1 in round 10 and hid five more behind the
SortAggregate ``key=`` spelling in round 11). Five queries were
rewritten and the non-applicable cases documented in ``SCALE.md`` —
but nothing SWEPT the registry: a future self-join on an enum-bounded
key would land silently. This audit is that sweep: every self-join
must either be rewritten joinless or carry a written reason
(unbounded accumulation, skew distribution, dimension re-use, ...).

Detection: a join node in the optimized logical plan whose left and
right subtrees both contain a ``LogicalRelation`` leaf over the same
parquet file. This catches aggregates joined back to their own input
and dimension tables scanned twice (TPC-H q7's two nation legs) alike
— both belong in the triage file, with different reasons.

Two join shapes are skipped CATEGORICALLY (each pinned by a planted
meta-test in ``tests/test_selfjoin_audit.py``):

  * a join with a construction-BOUNDED side — a global (empty-key)
    aggregate, a literal limit, or a composition of those under
    row-preserving operators. Its output is <= k x other-side rows:
    broadcast-class, governed by ``scripts/broadcast_audit.py``, not
    a scaling x scaling pair space (this removes the ubiquitous
    ``crossJoin(broadcast(one_row_total))`` ratio pattern);
  * joins keyed on ``__prefix_pid`` — the two-level prefix-sum
    operator's partition-boundary hand-off (``operators/prefix.py``):
    key cardinality = shuffle-partition COUNT, a config literal,
    never data rows (same triage as the broadcast allowlist's
    ``keys:__prefix_pid`` entries).

Known blind spots, by design:

  * ``LogicalRDD`` leaves (``lineage_cut`` / ``localCheckpoint``
    outputs inside iterative queries) are opaque — the per-iteration
    join structure is audited where the iteration is built, not here;
  * stage-boundary caches would print as ``InMemoryRelation`` and
    hide base tables, so the sweep clears the SQL cache after
    building each query and BEFORE extracting its plan (plan
    structure is what's audited; the cache substitution is a
    performance overlay).

Entry grammar (also the allowlist ``entry`` field):
  ``selfjoin:<t1[,t2...]>:<JoinType>:keys=<normalized condition>``
    — <t1,...> are the shared base tables (sorted), JoinType is the
    logical join type, and the condition has Catalyst expression ids
    stripped (``user_id#12 = user_id#45`` -> ``user_id = user_id``)
    so entries are stable across sessions. Condition-less joins
    print ``keys=<cross>``.

Structure is scale-independent, so the sweep plans against the small
default fixture (override with argv[1]).

Usage: python scripts/selfjoin_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from broadcast_audit import diff_against_allowlist  # noqa: E402

ALLOWLIST_PATH = os.path.join(_REPO, "scripts", "selfjoin_allowlist.json")

_EXPR_ID = re.compile(r"#\d+L?")
# lambda variables print as ``lambda x_<n>`` where <n> comes from a
# SESSION-GLOBAL counter — the same query planned after 200 others
# gets ``x_217`` where a fresh session gets ``x_1``. Only rewrite
# identifiers directly behind the ``lambda `` keyword: bare names
# like NATION_18 are real values and must survive.
_LAMBDA_VAR = re.compile(r"lambda ([A-Za-z]+)_\d+")
_WS = re.compile(r"\s+")


def normalize_condition(raw: str) -> str:
    """Strip Catalyst expression ids and lambda-variable counters and
    collapse whitespace so the same logical condition yields the same
    entry in every session."""
    s = _EXPR_ID.sub("", raw)
    s = _LAMBDA_VAR.sub(r"lambda \1", s)
    return _WS.sub(" ", s).strip()


def _walk(jnode):
    yield jnode
    for i in range(jnode.children().size()):
        yield from _walk(jnode.children().apply(i))


def _leaf_tables(jnode) -> frozenset[str]:
    """Base parquet table names readable under this logical subtree.
    Opaque leaves (LogicalRDD, LocalRelation, InMemoryRelation) carry
    no table identity and are skipped — see the module docstring."""
    tables = set()
    for n in _walk(jnode):
        if n.getClass().getSimpleName() != "LogicalRelation":
            continue
        try:
            paths = n.relation().location().rootPaths().mkString(",")
        except Exception:  # non-file relation (e.g. JDBC): no identity
            continue
        for p in paths.split(","):
            base = os.path.basename(p.rstrip("/"))
            tables.add(base.removesuffix(".parquet"))
    return frozenset(tables)


# Logical nodes that cannot INCREASE row count: a bounded child stays
# bounded through them. (Generate/explode and joins are deliberately
# absent — they multiply.)
_ROW_NONINCREASING = {
    "Project",
    "Filter",
    "Sort",
    "SubqueryAlias",
    "Window",
    "Repartition",
    "RepartitionByExpression",
    "ResolvedHint",
    "Deduplicate",
    "Distinct",
    # Sample is handled specially in _is_bounded: only WITHOUT
    # replacement is it row-non-increasing (with replacement it can
    # emit more rows than its input).
}


def _is_bounded(jnode) -> bool:
    """True iff this logical subtree's row count is bounded BY
    CONSTRUCTION: a global (empty grouping keys) aggregate, a literal
    limit, or a join/composition of bounded pieces under row-
    non-increasing operators. Mirrors the broadcast audit's
    'empty-key aggregates and limit-topped subtrees are categorically
    bounded' rule, extended structurally."""
    cls = jnode.getClass().getSimpleName()
    if cls == "Aggregate":
        return jnode.groupingExpressions().isEmpty()
    if cls in ("GlobalLimit", "LocalLimit"):
        return True
    if cls == "Join":
        return _is_bounded(jnode.left()) and _is_bounded(jnode.right())
    if cls == "Sample":
        # with replacement a Sample can EMIT MORE rows than its input
        # (each row drawn Poisson(fraction) times), so only the
        # without-replacement form preserves a bound
        return (not jnode.withReplacement()) and _is_bounded(
            jnode.children().apply(0)
        )
    if cls in _ROW_NONINCREASING and jnode.children().size() == 1:
        return _is_bounded(jnode.children().apply(0))
    return False


def selfjoin_entries(df) -> list[str]:
    """All shared-base-table joins in ``df``'s optimized logical plan,
    as normalized, session-stable entry strings (sorted, deduped).

    NOTE: callers auditing queries built with ``stage_boundary`` must
    clear the SQL cache first (``spark.catalog.clearCache()``) or the
    cached subtrees print as InMemoryRelation and hide base tables.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    finds = []
    for n in _walk(plan):
        if n.getClass().getSimpleName() != "Join":
            continue
        common = _leaf_tables(n.left()) & _leaf_tables(n.right())
        if not common:
            continue
        # a construction-bounded side makes this broadcast-class, not
        # a scaling x scaling pair space (module docstring)
        if _is_bounded(n.left()) or _is_bounded(n.right()):
            continue
        cond = n.condition()
        keys = (
            normalize_condition(cond.get().toString())
            if cond.isDefined()
            else "<cross>"
        )
        # prefix-sum partition-boundary hand-off: key cardinality is
        # the shuffle-partition config literal (operators/prefix.py)
        if "__prefix_pid" in keys:
            continue
        jt = n.joinType().toString()
        # rstrip the 160-char cap: a cut landing on a space would
        # plant an invisible trailing-space diff vs the JSON triage
        finds.append(
            f"selfjoin:{','.join(sorted(common))}:{jt}:"
            f"keys={keys[:160].rstrip()}"
        )
    return sorted(set(finds))


def load_allowlist(path: str = ALLOWLIST_PATH) -> dict[str, dict[str, str]]:
    """{query -> {entry -> reason}} — same shape as the broadcast
    audit's, validated eagerly so a broken triage file fails BEFORE
    the planning sweep."""
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for q, entries in raw.items():
        if q.startswith("_"):
            continue
        out[q] = {}
        for e in entries:
            assert e["entry"].startswith("selfjoin:"), (q, e)
            assert len(e["reason"]) >= 10, (q, e)
            out[q][e["entry"]] = e["reason"]
    return out


def main() -> int:
    sf = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    )
    allow = load_allowlist()  # fail fast, before the planning sweep
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    found: dict[str, list[str]] = {}
    planerrs = 0
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf)
            # drop stage caches so base tables stay visible (docstring)
            release_stage_boundaries()
            spark.catalog.clearCache()
            entries = selfjoin_entries(df)
        except Exception as ex:  # noqa: BLE001 — audit, not execution
            print(f"{name} PLANERR {str(ex).splitlines()[0][:60]}")
            planerrs += 1
            continue
        if entries:
            found[name] = entries
            for e in entries:
                print(f"{name} || {e}")

    untriaged, stale = diff_against_allowlist(found, allow)
    for q, e in stale:
        print(f"STALE allowlist entry (prune?): {q} || {e}")
    for q, e in untriaged:
        print(
            f"UNTRIAGED self-join: {q} || {e} — per-key group bounded "
            "by construction? rewrite joinless (collect_set + double "
            "explode, the round-11 class); genuinely unbounded or a "
            "dimension re-use? add to scripts/selfjoin_allowlist.json "
            "with the reason"
        )
    print(
        f"DONE untriaged={len(untriaged)} stale={len(stale)} "
        f"planerrs={planerrs}"
    )
    # a query that failed to PLAN was not audited — fail closed so CI
    # can't treat a vacuous sweep (e.g. a missing fixture dir making
    # every query PLANERR) as green
    return 1 if (untriaged or planerrs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
