"""Static-broadcast audit at scale: plan every registered query against
a LARGE fixture (default ``_scratch/sf1`` — build it with
``scripts/gen_sf1.py``), extract each BroadcastExchange whose subtree
cardinality is NOT bounded by construction, and diff the findings
against the checked-in triage allowlist
(``scripts/broadcast_allowlist.json``). An entry missing from the
allowlist is an UNTRIAGED scale risk and the script **exits nonzero**
— the triage is data a new query must extend, not prose an audit log
can silently outgrow (round-11 hardening; round 10's triage table was
hand-maintained in BROADCAST_AUDIT_r10.log and nothing failed when a
new broadcast-of-aggregate appeared).

Why this exists (round 10): Catalyst's size estimates for post-explode
frames, pruned-column scans, and cold caches come out far below
reality, and a statically-planned BroadcastHashJoin executes its build
EAGERLY — if the hinted-or-estimated frame actually scales with the
data, the build OOMs before AQE ever sees runtime stats. The
asymmetry that matters: AQE can UPGRADE a static shuffle join to a
broadcast join from accurate runtime stats, but cannot demote an
already-chosen broadcast. So any join-back of an aggregate keyed by a
corpus-scaling domain (token/shingle vocabulary, per-user / per-doc /
per-customer frames, band keys, chunk contents) must carry an explicit
shuffle hint; static broadcast is reserved for frames bounded by
construction (dimension tables, global/1-row reductions, fixed bin /
event-type / calendar keys, top-k limits, query-term filters).

This cannot be a pytest sweep: the signal ("estimate small, truth
big") only exists at scale — at sf0.001 every broadcast is correct.
Run it each round after registry changes; an UNTRIAGED line means
either (a) the new broadcast is bounded by construction — add it to
the allowlist WITH the boundedness reason — or (b) it scales — fix
the plan (shuffle_hash/merge hint), don't allowlist it.

Entry grammar (also the allowlist ``entry`` field):
  ``keys:<normalized grouping keys>`` — the topmost SPINE aggregate
    under the BroadcastExchange has these (non-empty) grouping keys;
    the broadcast cardinality is that key domain. Keys are
    normalized by stripping Catalyst expression ids (``tok#158`` ->
    ``tok``) so entries are stable across sessions.
  ``jointop:<JoinNode>`` — a join/union sits ABOVE any aggregate in
    the subtree, so the broadcast cardinality is a join output and
    no single aggregate governs it (round-10 ADVICE: the old scan
    reported the first aggregate line-wise, which in a join-topped
    subtree may sit on a nested branch and mislabel the risk).
    These always need a hand-written boundedness reason.
Empty-key aggregates (<=1-row global reductions) and
TakeOrdered/GlobalLimit-bounded subtrees are skipped — bounded by
construction, categorically.

Usage: python scripts/broadcast_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ALLOWLIST_PATH = os.path.join(_REPO, "scripts", "broadcast_allowlist.json")

# Plan nodes whose output cardinality is not a function of a single
# child aggregate — a broadcast subtree topped by one of these needs
# its own triage entry.
_JOIN_NODE = re.compile(
    r"\b(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|Union)\b"
)
# keys?: HashAggregate prints ``keys=[...]`` but SortAggregate prints
# ``key=[...]`` — round 11 found mlops_propensity_match's struct-max
# SortAggregate invisible to the keys=-only pattern (the scan then
# fell through into the cached InMemoryRelation's printed subtree and
# mislabeled the entry as its nested Union)
_AGG_NODE = re.compile(
    r"(?:HashAggregate|ObjectHashAggregate|SortAggregate)\(keys?=\[([^\]]*)\]"
)
_BOUNDING_NODE = re.compile(r"TakeOrderedAndProject|GlobalLimit")


def indent(line: str) -> int:
    return len(re.match(r"[\s:+\-*]*", line).group(0))


def normalize_keys(raw: str) -> str:
    """Strip Catalyst expression ids so entries are session-stable:
    ``tok#158`` -> ``tok``, ``pos#67L`` -> ``pos``. Cast wrappers and
    literal grouping expressions keep their textual shape."""
    return re.sub(r"#\d+L?", "", raw).strip()


def broadcast_entries(plan_string: str) -> list[str]:
    """One entry per BroadcastExchange whose subtree is not bounded by
    construction — see the module docstring for the entry grammar.

    Scan discipline (fixes the round-10 ADVICE mislabel): walk the
    subtree top-down and stop at the FIRST cardinality-governing node
    on the spine — a bounding limit (skip), a join/union
    (``jointop:``), or an aggregate (``keys:`` if non-empty, skip if
    global). An aggregate encountered AFTER a join sits on a nested
    branch and never governs the broadcast's row count, so it is
    never reported as if it did.
    """
    lines = plan_string.splitlines()
    finds: list[str] = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = indent(ln)
        for j in range(i + 1, len(lines)):
            if indent(lines[j]) <= d and lines[j].strip():
                break
            if _BOUNDING_NODE.search(lines[j]):
                break
            jm = _JOIN_NODE.search(lines[j])
            if jm:
                finds.append(f"jointop:{jm.group(1)}")
                break
            am = _AGG_NODE.search(lines[j])
            if am:
                if am.group(1).strip():
                    finds.append(f"keys:{normalize_keys(am.group(1))[:80]}")
                break
    return sorted(set(finds))


def load_allowlist(path: str = ALLOWLIST_PATH) -> dict[str, dict[str, str]]:
    """{query -> {entry -> reason}}; the file stores a list of
    {entry, reason} objects per query so reasons stay adjacent to
    what they justify."""
    with open(path) as f:
        raw = json.load(f)
    return {
        q: {e["entry"]: e["reason"] for e in entries}
        for q, entries in raw.items()
        if not q.startswith("_")
    }


def diff_against_allowlist(
    found: dict[str, list[str]], allow: dict[str, dict[str, str]]
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Returns (untriaged, stale): entries present in the audit but
    not the allowlist (RED), and allowlist entries the audit no
    longer produces (prune candidates, WARN only — a plan change that
    removes a broadcast is an improvement, not a failure)."""
    untriaged = [
        (q, e)
        for q, entries in sorted(found.items())
        for e in entries
        if e not in allow.get(q, {})
    ]
    stale = [
        (q, e)
        for q, entries in sorted(allow.items())
        for e in entries
        if e not in set(found.get(q, []))
    ]
    return untriaged, stale


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "_scratch", "sf1"
    )
    # Fail fast on a missing/malformed allowlist BEFORE the multi-
    # minute planning sweep — a broken triage file used to surface as
    # an unhandled traceback only after every query was planned
    # (round-11 ADVICE).
    allow = load_allowlist()
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
        release_stage_boundaries()
        try:
            s = (
                QUERIES[name](spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit, not execution
            print(f"{name} PLANERR {str(ex).splitlines()[0][:60]}")
            planerrs += 1
            continue
        entries = broadcast_entries(s)
        if entries:
            found[name] = entries
            print(f"{name} || {' ;; '.join(entries)}")

    untriaged, stale = diff_against_allowlist(found, allow)
    for q, e in stale:
        print(f"STALE allowlist entry (prune?): {q} || {e}")
    for q, e in untriaged:
        print(
            f"UNTRIAGED broadcast: {q} || {e} — bounded by construction? "
            "add to scripts/broadcast_allowlist.json with the reason; "
            "scales with data? fix the plan (shuffle_hash/merge hint)"
        )
    print(
        f"DONE untriaged={len(untriaged)} stale={len(stale)} "
        f"planerrs={planerrs}"
    )
    # a query that failed to PLAN was not audited — fail closed so CI
    # can't treat a vacuous sweep (e.g. a missing fixture dir making
    # every query PLANERR) as green; same rule as selfjoin_audit
    return 1 if (untriaged or planerrs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
