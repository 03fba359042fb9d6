"""Meta-tests for scripts/broadcast_audit.py — the sf1 static-broadcast
gate (round 11: the hand-triaged prose table of BROADCAST_AUDIT_r10.log
became a diffable allowlist the audit script fails red against).

These tests exist so the gate cannot rot silently:

  * the entry extractor must FLAG a planted broadcast-of-keyed-
    aggregate built from a real Spark plan (catches plan-text format
    drift on a Spark upgrade — the round-11 lesson: SortAggregate
    spells its grouping keys ``key=[...]`` where HashAggregate spells
    ``keys=[...]``, and the r10 HashAggregate-only pattern was blind
    to five corpus-scaling static broadcasts because of it);
  * join-topped subtrees report the JOIN, never a nested branch
    aggregate that does not govern the broadcast cardinality (the
    round-10 ADVICE mislabel);
  * the allowlist diff turns an un-triaged entry into a nonzero exit
    and reports stale entries for pruning;
  * every allowlist entry names a live registered query, so the file
    cannot accumulate rot.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from broadcast_audit import (  # noqa: E402
    ALLOWLIST_PATH,
    broadcast_entries,
    diff_against_allowlist,
    load_allowlist,
    normalize_keys,
)


def test_normalize_strips_expression_ids():
    assert normalize_keys("tok#158") == "tok"
    assert normalize_keys("pos#67L") == "pos"
    assert normalize_keys("r#928, bucket#929L") == "r, bucket"


def test_flags_planted_keyed_aggregate_real_plan(spark, sf_smoke):
    """End-to-end planted offender: broadcast(groupBy(...).agg(...))
    joined back must produce a keys: entry from the REAL executed-plan
    text — this is the assertion that survives Spark plan-format
    changes or fails loudly."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select("event_type", "value")
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    joined = ev.join(F.broadcast(agg), "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    entries = broadcast_entries(plan)
    assert "keys:event_type" in entries, (
        f"planted broadcast-of-keyed-aggregate not flagged: {entries} — "
        "the audit's plan-text patterns no longer match Spark's output"
    )


def test_flags_sortaggregate_key_spelling(spark, sf_smoke):
    """The round-11 regression: a struct-min/max aggregate plans as
    SortAggregate, which prints ``key=[...]`` — the extractor must see
    it (five real scale bugs hid behind this spelling in round 10)."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # min(struct) is not hash-aggregable -> SortAggregate
    agg = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id")).alias("first_k")
    )
    joined = ev.join(F.broadcast(agg), "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate(key=" in plan, (
        "fixture no longer plans a SortAggregate — pick another "
        "non-hash-aggregable function so the key= spelling stays covered"
    )
    assert "keys:user_id" in broadcast_entries(plan)


def test_jointop_reported_not_nested_branch_aggregate():
    """A join above any aggregate inside the broadcast subtree governs
    the cardinality; the nested branch aggregate must NOT be reported
    as if it did (the round-10 ADVICE mislabel). Synthetic plan text:
    the precedence rule is a pure line-scan property."""
    plan = "\n".join([
        "BroadcastExchange HashedRelationBroadcastMode(...)",
        "+- Project [a#1L, n#2L]",
        "   +- SortMergeJoin [a#1L], [a#3L], Inner",
        "      :- HashAggregate(keys=[a#1L], functions=[count(1)])",
        "      :  +- Exchange hashpartitioning(a#1L, 8)",
        "      +- Sort [a#3L ASC NULLS FIRST], false, 0",
    ])
    assert broadcast_entries(plan) == ["jointop:SortMergeJoin"]


def test_bounded_subtrees_skipped():
    """Global (empty-key) reductions and limit-topped subtrees are
    bounded by construction and produce no entry."""
    plan = "\n".join([
        "BroadcastExchange IdentityBroadcastMode",
        "+- HashAggregate(keys=[], functions=[count(1)])",
        "   +- Exchange SinglePartition",
        "BroadcastExchange HashedRelationBroadcastMode(...)",
        "+- GlobalLimit 10",
        "   +- HashAggregate(keys=[tok#5], functions=[count(1)])",
    ])
    assert broadcast_entries(plan) == []


def test_diff_red_on_untriaged_and_reports_stale():
    found = {"q1": ["keys:tok"], "q2": ["keys:bin"]}
    allow = {"q2": {"keys:bin": "fixed bins"}, "q3": {"keys:pos": "gone"}}
    untriaged, stale = diff_against_allowlist(found, allow)
    assert untriaged == [("q1", "keys:tok")]
    assert stale == [("q3", "keys:pos")]


def test_diff_green_when_all_triaged():
    found = {"q1": ["keys:bin"]}
    allow = {"q1": {"keys:bin": "fixed bins"}}
    untriaged, stale = diff_against_allowlist(found, allow)
    assert untriaged == [] and stale == []


def test_allowlist_names_are_live_registry_entries():
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    allow = load_allowlist()
    dead = sorted(set(allow) - set(QUERIES))
    assert not dead, f"allowlist references unregistered queries: {dead}"
    for q, entries in allow.items():
        for entry, reason in entries.items():
            assert entry.startswith(("keys:", "jointop:")), (q, entry)
            assert len(reason) >= 10, (
                f"{q} || {entry}: a triage reason must actually state "
                "the boundedness argument"
            )


def test_allowlist_file_is_tracked():
    """The gate is only a gate if the triage data ships with the repo."""
    import subprocess

    out = subprocess.run(
        ["git", "ls-files", "--error-unmatch", ALLOWLIST_PATH],
        capture_output=True,
        cwd=os.path.dirname(ALLOWLIST_PATH),
    )
    assert out.returncode == 0, "scripts/broadcast_allowlist.json untracked"


@pytest.mark.parametrize("bad", ["", "   "])
def test_empty_key_groups_never_reported(bad):
    plan = "\n".join([
        "BroadcastExchange IdentityBroadcastMode",
        f"+- HashAggregate(keys=[{bad}], functions=[count(1)])",
    ])
    assert broadcast_entries(plan) == []


@pytest.mark.slow
def test_audits_fail_closed_on_planerr(spark, monkeypatch, tmp_path):
    """Round-13 ADVICE fix, both audits: a query that fails to PLAN
    was not audited, so the sweep must exit NONZERO — previously a
    missing fixture dir made every query PLANERR and the audit
    reported untriaged=0 with zero actual coverage (a vacuous green).
    Run each main() against an empty dir: every build raises at load,
    planerrs == registry size, exit code 1."""
    import broadcast_audit
    import selfjoin_audit

    bogus = str(tmp_path / "no_such_fixture")
    os.makedirs(bogus, exist_ok=True)
    for mod in (broadcast_audit, selfjoin_audit):
        monkeypatch.setattr(
            sys, "argv", [os.path.basename(mod.__file__), bogus]
        )
        assert mod.main() == 1, (
            f"{mod.__name__}.main() returned 0 on a fixture dir where "
            "nothing could plan — the PLANERR fail-closed rule is gone"
        )
