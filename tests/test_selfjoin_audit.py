"""Meta-tests for scripts/selfjoin_audit.py — the registry-wide
bounded-group self-join sweep (round 12, verdict ask #4: the round-11
joinless-rewrite class had five instances and a documented
non-applicability list, but nothing would FLAG a future self-join on
an enum-bounded key; this audit is that sweep, and these tests are its
planted offenders so it cannot rot silently).

Guards:
  * the extractor must FLAG a planted self-join built from a real
    Spark logical plan (catches JVM plan-API drift on upgrade);
  * a genuinely joinless bounded-group plan (the round-11 rewrite
    shape: collect_set + double explode) must produce NO entry;
  * a join against a construction-BOUNDED side (global aggregate /
    literal limit) is skipped — it's broadcast-class, the broadcast
    audit's jurisdiction;
  * ``__prefix_pid`` partition-boundary joins are skipped (key
    cardinality = a config literal, operators/prefix.py);
  * joins between DIFFERENT base tables never flag;
  * every allowlist entry names a live registered query with a real
    reason, and the triage file ships with the repo.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

from selfjoin_audit import (  # noqa: E402
    ALLOWLIST_PATH,
    load_allowlist,
    normalize_condition,
    selfjoin_entries,
)


def test_normalize_strips_expression_ids():
    assert normalize_condition("(user_id#12 = user_id#45L)") == (
        "(user_id = user_id)"
    )
    assert normalize_condition("a#1L <\n b#2") == "a < b"


def test_normalize_strips_lambda_counters():
    """Lambda variables carry a SESSION-GLOBAL counter (``x_217`` in a
    sweep that planned 200 queries first, ``x_1`` in a fresh session)
    — entries must not depend on planning order. Real identifiers
    that merely end in _<digits> (NATION_18) must survive."""
    assert normalize_condition(
        "exists(lis, lambdafunction((lambda x_217#9.sd > d#3), "
        "lambda x_217#9, false))"
    ) == "exists(lis, lambdafunction((lambda x.sd > d), lambda x, false))"
    assert normalize_condition("(supp_nation#1 = NATION_18)") == (
        "(supp_nation = NATION_18)"
    )


def test_flags_planted_selfjoin_real_plan(spark, sf_smoke):
    """The planted offender: an enum-key self-join of events with
    itself must produce a selfjoin:events entry from the REAL
    optimized logical plan."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select(
        "user_id", "event_type", "value"
    )
    agg = ev.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("v")
    )
    a = agg.select(
        F.col("user_id"),
        F.col("event_type").alias("ta"),
        F.col("v").alias("va"),
    )
    b = agg.select(
        F.col("user_id"),
        F.col("event_type").alias("tb"),
        F.col("v").alias("vb"),
    )
    joined = a.join(b, "user_id").filter(F.col("ta") != F.col("tb"))
    entries = selfjoin_entries(joined)
    assert any(e.startswith("selfjoin:events:Inner:") for e in entries), (
        f"planted bounded-key self-join not flagged: {entries} — the "
        "audit's logical-plan traversal no longer matches Spark's API"
    )
    assert any("user_id = user_id" in e for e in entries), entries


def test_joinless_rewrite_shape_produces_no_entry(spark, sf_smoke):
    """The round-11 rewrite target state: collect_set + double explode
    has no join node, so the audit must stay silent."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").filter(
        F.col("user_id").isNotNull()
    )
    pairs = (
        ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("arr"))
        .select(F.explode("arr").alias("a"), F.col("arr"))
        .select("a", F.explode("arr").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .count()
    )
    assert selfjoin_entries(pairs) == []


def test_bounded_side_join_skipped(spark, sf_smoke):
    """crossJoin(broadcast(global_aggregate)) — the ubiquitous ratio
    pattern — is broadcast-class, not a pair space: no entry."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select("event_type", "value")
    total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    ratio = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select("event_type", (F.col("n") / F.col("n_total")).alias("share"))
    )
    assert selfjoin_entries(ratio) == []


def test_limit_bounded_side_skipped(spark, sf_smoke):
    """A literal-limit side is bounded by construction: no entry."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select("event_id", "user_id")
    top = ev.orderBy("event_id").limit(5)
    joined = ev.join(
        top.select(F.col("user_id").alias("u")),
        F.col("user_id") == F.col("u"),
    )
    assert selfjoin_entries(joined) == []


def test_sample_with_replacement_not_bounded(spark, sf_smoke):
    """Round-13 ADVICE fix: Sample WITH replacement can emit MORE
    rows than its input (each row drawn Poisson(fraction) times), so
    a limit bounded BELOW a with-replacement sample must still flag —
    only the without-replacement form preserves the bound."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select("event_id", "user_id")
    top = ev.orderBy("event_id").limit(5)
    with_repl = top.sample(withReplacement=True, fraction=3.0, seed=7)
    without_repl = top.sample(withReplacement=False, fraction=0.5, seed=7)
    j_bad = ev.join(
        with_repl.select(F.col("user_id").alias("u")),
        F.col("user_id") == F.col("u"),
    )
    j_ok = ev.join(
        without_repl.select(F.col("user_id").alias("u")),
        F.col("user_id") == F.col("u"),
    )
    assert selfjoin_entries(j_bad), (
        "with-replacement sample above a limit treated as bounded — "
        "Poisson draws can exceed the input row count"
    )
    assert selfjoin_entries(j_ok) == [], (
        "without-replacement sample over a bounded side must stay "
        "bounded (row-non-increasing)"
    )


def test_prefix_pid_join_skipped(spark, sf_smoke):
    """The two-level prefix-sum operator's partition-boundary join is
    config-bounded (operators/prefix.py) and must not flag; queries
    built on running_total would otherwise all carry noise entries."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sum,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    ev = load(spark, sf_smoke, "events").select(
        "event_id", F.col("value").cast("double").alias("v")
    )
    rt = global_prefix_sum(ev, ["event_id"], "v")
    assert all("__prefix_pid" not in e for e in selfjoin_entries(rt))


def test_different_tables_never_flag(spark, sf_smoke):
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
    )

    o = load(spark, sf_smoke, "orders")
    c = load(spark, sf_smoke, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    assert selfjoin_entries(joined) == []


def test_allowlist_names_are_live_registry_entries():
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    allow = load_allowlist()
    dead = sorted(set(allow) - set(QUERIES))
    assert not dead, f"allowlist references unregistered queries: {dead}"
    for q, entries in allow.items():
        for entry, reason in entries.items():
            assert entry.startswith("selfjoin:"), (q, entry)
            assert len(reason) >= 10, (
                f"{q} || {entry}: a triage reason must actually state "
                "the boundedness / lookup / gate argument"
            )


def test_allowlist_file_is_tracked():
    import subprocess

    out = subprocess.run(
        ["git", "ls-files", "--error-unmatch", ALLOWLIST_PATH],
        capture_output=True,
        cwd=os.path.dirname(ALLOWLIST_PATH),
    )
    assert out.returncode == 0, "scripts/selfjoin_allowlist.json untracked"
