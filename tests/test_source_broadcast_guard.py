"""Source-level twin of the broadcast-hint plan sweep (round 13).

``tests/test_plan_hygiene.py::test_no_broadcast_hint_over_scaling_scan``
walks the ANALYZED plan of every registered query — which makes it
blind to a hint sitting UPSTREAM of a ``lineage_cut`` /
``localCheckpoint``: the returned frame's plan starts at a LogicalRDD,
but the eager broadcast build still executes when the cut
materializes. Round 13 found exactly one such site
(``star_pagerank_nations``'s ``F.broadcast(supp)`` feeding the edge
build). This guard closes the blind spot at the SOURCE level: a tiny
AST dataflow pass over every ``plans/*.py`` function tracks which
local names are (chains over) unbounded loads of SF-scaling fixture
tables, and flags any ``F.broadcast(<that name>)`` call — cut or no
cut, registered or helper.

Scope and limits, by design:
  * an attribute chain through ``agg`` / ``limit`` is treated as
    cardinality-bounding (mirrors the plan sweep's Aggregate /
    GlobalLimit rule); ``select``/``filter``/``withColumn``/
    ``alias``/``join``/``hint`` etc. are not;
  * the pass is intra-function and name-based — good enough for this
    codebase's idiom (``supp = load(...); ...join(F.broadcast(supp))``)
    and deliberately simple; the plan sweep remains the semantic
    authority for everything it CAN see;
  * bounded-by-construction query-vector frames keep the same triage
    file as the plan sweep (``_ALLOWED_FUNCS``), with written reasons.
"""

from __future__ import annotations

import ast
import glob
import os

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "big_data_backblaze_hard_drive_failure_spark",
    "plans",
)

# keep in sync with tests/test_plan_hygiene.py::_SCALING_TABLE_SIG
SCALING_TABLES = {
    "customer",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
    "supplier",
    "part",
}

# method names whose presence in a chain makes the frame's row count
# data-independent — mirrors the plan sweep's bounding-node rule
# (Aggregate / GlobalLimit / Deduplicate), plus createDataFrame
# (literal driver-side rows: star_hypothetical_rank's probe grid)
_BOUNDING_ATTRS = {
    "agg",
    "limit",
    "distinct",
    "dropDuplicates",
    "createDataFrame",
}

# helper FUNCTIONS whose return value is bounded by construction even
# though a scaling frame flows in (the pass is intra-function and
# cannot see their bodies): cm_sketch aggregates to a d x w grid of
# CONFIG-literal cells (768 at the registered settings) regardless of
# input rows — and its broadcast is additionally covered by the plan
# sweep's Aggregate rule, since countmin has no lineage cut.
_BOUNDING_HELPERS = {"cm_sketch"}

# function -> reason, mirroring the plan sweep's
# _BOUNDED_BROADCAST_ALLOWLIST: the broadcast side is the QUERY-VECTOR
# frame — embeddings filtered to a literal fixed vec_id set (<= 5 rows
# forever); a Filter, which neither sweep can prove bounding.
# datapipe_mmr_diverse_topk is the case that MOTIVATES this guard
# existing at all: its greedy loop collects per round and returns a
# createDataFrame LocalRelation, so the plan sweep never sees its
# broadcast(q) — q is embeddings filtered to the literal vec_id == 0
# (exactly one row).
_ALLOWED_FUNCS = {
    "datapipe_cosine_topk",
    "datapipe_hard_negatives",
    "datapipe_knn_ivf",
    "datapipe_mmr_diverse_topk",
}


def _chain_info(node: ast.expr, scaling_names: set[str]):
    """(is_scaling, bounded) for an expression: does it contain an
    unbounded scaling-table load (directly or via a tracked name), and
    does any attribute call on the path apply a bounding method?"""
    is_scaling = False
    bounded = False
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            f = n.func
            if isinstance(f, ast.Name) and f.id == "load":
                args = n.args
                if (
                    len(args) >= 3
                    and isinstance(args[2], ast.Constant)
                    and args[2].value in SCALING_TABLES
                ):
                    is_scaling = True
            if isinstance(f, ast.Name) and f.id in _BOUNDING_HELPERS:
                bounded = True
            if (
                isinstance(f, ast.Attribute)
                and f.attr in _BOUNDING_ATTRS
            ):
                bounded = True
        elif isinstance(n, ast.Name) and n.id in scaling_names:
            is_scaling = True
    return is_scaling, bounded


def _broadcast_arg(node: ast.Call):
    """The argument of F.broadcast(x) / broadcast(x), else None."""
    f = node.func
    name = (
        f.attr
        if isinstance(f, ast.Attribute)
        else (f.id if isinstance(f, ast.Name) else None)
    )
    if name == "broadcast" and node.args:
        return node.args[0]
    return None


def scan_function(fn: ast.FunctionDef) -> list[str]:
    """Offending ``F.broadcast(<scaling frame>)`` descriptions in one
    function, via a straight-line pass over its assignments.

    ``ast.walk`` is breadth-first, not source order, so events
    (assignments and broadcast calls) are processed sorted by source
    position — a rebinding updates the taint env exactly where it
    happens (see test_reassignment_clears_scaling_taint)."""
    events: list[tuple[int, int, int, ast.AST]] = []
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            # order by END of the statement: the RHS reads the OLD env
            # and any broadcast call inside it is evaluated before the
            # binding takes effect; sort key 0 < 1 puts calls first on
            # the (pathological) same end position
            events.append(
                (node.end_lineno, node.end_col_offset, 1, node)
            )
        elif isinstance(node, ast.Call) and _broadcast_arg(node):
            events.append((node.lineno, node.col_offset, 0, node))
    events.sort(key=lambda e: e[:3])

    scaling: set[str] = set()
    offenders: list[str] = []
    for _, _, _, node in events:
        if isinstance(node, ast.Assign):
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name):
                is_sc, bounded = _chain_info(node.value, scaling)
                if is_sc and not bounded:
                    scaling.add(tgt.id)
                else:
                    scaling.discard(tgt.id)
        else:
            arg = _broadcast_arg(node)
            is_sc, bounded = _chain_info(arg, scaling)
            if is_sc and not bounded:
                desc = ast.unparse(arg)[:60]
                offenders.append(
                    f"{fn.name}:{node.lineno} broadcast({desc})"
                )
    return offenders


def _scan_source(src: str, path: str = "<mem>") -> list[str]:
    tree = ast.parse(src, filename=path)
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            if node.name in _ALLOWED_FUNCS:
                continue
            out.extend(
                f"{os.path.basename(path)}::{o}"
                for o in scan_function(node)
            )
    return out


def test_no_source_level_broadcast_of_scaling_frame():
    offenders = []
    for path in sorted(glob.glob(os.path.join(PLANS_DIR, "*.py"))):
        with open(path) as f:
            offenders.extend(_scan_source(f.read(), path))
    assert not offenders, (
        "F.broadcast() over an (chain on an) unbounded SF-scaling "
        "table load — the eager-build OOM class; invisible to the "
        "plan sweep if a lineage_cut sits between the hint and the "
        "returned frame (the star_pagerank_nations round-13 case). "
        "Drop the hint (AQE runtime-broadcasts small sides) or triage "
        f"in _ALLOWED_FUNCS with a reason:\n" + "\n".join(offenders)
    )


def test_source_guard_catches_planted_offender():
    """Planted-offender meta-test, the repo idiom: the pass must FLAG
    a broadcast of (a select-chain on) a scaling load — including one
    hidden behind a lineage_cut — and PASS fixed-cardinality nation,
    an agg-bounded chain, and an allowlisted function."""
    bad = _scan_source(
        "def q(spark, sf_dir):\n"
        "    supp = load(spark, sf_dir, 'supplier').select('s_suppkey')\n"
        "    edges = li.join(F.broadcast(supp), 'k')\n"
        "    edges = lineage_cut(edges)\n"
        "    return edges\n"
    )
    assert len(bad) == 1 and "broadcast(supp)" in bad[0], bad

    bad_inline = _scan_source(
        "def q(spark, sf_dir):\n"
        "    return li.join(F.broadcast(load(spark, sf_dir, 'part')), 'k')\n"
    )
    assert len(bad_inline) == 1, bad_inline

    ok = _scan_source(
        "def q(spark, sf_dir):\n"
        "    nation = load(spark, sf_dir, 'nation')\n"
        "    tot = load(spark, sf_dir, 'orders').agg(F.sum('x').alias('t'))\n"
        "    med = load(spark, sf_dir, 'orders').groupBy('k').agg(\n"
        "        F.sum('x').alias('t')).limit(5)\n"
        "    return li.join(F.broadcast(nation), 'k')\\\n"
        "        .crossJoin(F.broadcast(tot)).join(F.broadcast(med), 'k')\n"
    )
    assert ok == [], ok

    allowed = _scan_source(
        "def datapipe_cosine_topk(spark, sf_dir):\n"
        "    q = load(spark, sf_dir, 'embeddings').filter('vec_id < 5')\n"
        "    return base.join(F.broadcast(q), 'k')\n"
    )
    assert allowed == [], allowed


def test_reassignment_clears_scaling_taint():
    """A name rebound to a bounded frame must stop tainting later
    broadcasts (the straight-line env update, not a union)."""
    ok = _scan_source(
        "def q(spark, sf_dir):\n"
        "    s = load(spark, sf_dir, 'supplier')\n"
        "    s = s.agg(F.count('*').alias('n'))\n"
        "    return li.crossJoin(F.broadcast(s))\n"
    )
    assert ok == [], ok
