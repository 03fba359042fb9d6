"""Scale-layout mechanics: salting, bucketing, partition pruning.

These verify the 100 TB techniques actually do what they claim on
this Spark build — correct results for the salted join, a
shuffle-free plan for the bucketed join, partition filters for the
partitioned write — so the design notes in the docstrings are backed
by executed evidence, not folklore.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.operators.skew import salted_join
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
    write_bucketed_table,
    write_parquet,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark, sf_smoke):
    """Salted join == plain join, row for row (hot key included)."""
    orders = load(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_smoke, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            cust,
            on="c_custkey",
            n_salts=4,
        )
        .groupBy("c_mktsegment")
        .count()
    )
    a = {(r["c_mktsegment"], r["count"]) for r in plain.collect()}
    b = {(r["c_mktsegment"], r["count"]) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    """Two tables bucketed on the join key: the join plan contains no
    Exchange — the co-location paid for at write time. (Tables land in
    the default spark-warehouse dir — gitignored — and are dropped.)"""
    import uuid

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"b_orders_{suffix}", f"b_cust_{suffix}"
    orders = load(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_smoke, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    try:
        write_bucketed_table(orders, ta, "o_custkey", n_buckets=4)
        write_bucketed_table(cust, tb, "c_custkey", n_buckets=4)
        t1 = spark.table(ta)
        t2 = spark.table(tb)
        joined = t1.join(t2, t1.o_custkey == t2.c_custkey)
        # AQE off for a stable plan string; broadcast disabled so the
        # planner picks the sort-merge path bucketing co-locates (at
        # fixture scale it would otherwise just broadcast the dim)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        n_plain = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_partitioned_write_prunes_partitions(spark, sf_smoke, tmp_path):
    """partitionBy(day) write + day-filtered read: the scan carries a
    PartitionFilters entry and reads only matching directories."""
    path = str(tmp_path / "events_by_day")
    ev = load(spark, sf_smoke, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_parquet(ev, path, partition_by=["day"])
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    n_all = spark.read.parquet(path).count()
    n_day = back.count()
    assert 0 < n_day < n_all


def test_zorder_write_prunes_both_dims(spark, sf_smoke, tmp_path):
    """Z-order layout vs single-column sort, judged by the REAL
    parquet footers (pyarrow): with files clustered on the Morton key
    of (l_partkey, l_suppkey), a point predicate on EITHER column can
    skip most files via min/max stats; the single-column sort prunes
    only its own column and is useless for the other. This is exactly
    the skip Spark's pushed-down filters perform at scan time
    (PushedFilters is plan-asserted elsewhere) — here we measure the
    skippable fraction directly from the statistics."""
    import pyarrow.parquet as pq

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        write_zordered,
    )

    li = load(spark, sf_smoke, "lineitem").select("l_partkey", "l_suppkey")
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "singlesort")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def skippable_fraction(d: str, col: str, value: int) -> float:
        import pathlib

        files = sorted(pathlib.Path(d).glob("*.parquet"))
        assert len(files) >= 8, "expected a multi-file layout"
        skipped = total = 0
        for f in files:
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                total += 1
                cols = {
                    meta.row_group(rg).column(c).path_in_schema: meta.row_group(
                        rg
                    ).column(c).statistics
                    for c in range(meta.row_group(rg).num_columns)
                }
                st = cols[col]
                if not (st.min <= value <= st.max):
                    skipped += 1
        return skipped / total

    probe_part, probe_supp = 7, 7
    # both layouts prune the lead/first dimension well
    assert skippable_fraction(zdir, "l_partkey", probe_part) >= 0.5
    assert skippable_fraction(sdir, "l_partkey", probe_part) >= 0.5
    # only the z-ordered layout prunes the second dimension
    z_supp = skippable_fraction(zdir, "l_suppkey", probe_supp)
    s_supp = skippable_fraction(sdir, "l_suppkey", probe_supp)
    assert z_supp >= 0.4, f"z-order should skip on l_suppkey, got {z_supp}"
    assert s_supp == 0.0, f"single-sort can't skip on l_suppkey, got {s_supp}"


def test_compact_parquet_small_files(spark, sf_smoke, tmp_path):
    """Compaction folds a many-small-files directory into few
    target-sized files with identical content, and restores sort
    clustering when asked."""
    import glob

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        compact_parquet,
    )

    d = str(tmp_path / "smallfiles")
    ev = load(spark, sf_smoke, "events").select("event_id", "user_id")
    ev.repartition(64).write.mode("overwrite").parquet(d)
    assert len(glob.glob(d + "/*.parquet")) == 64
    before = {r["event_id"] for r in spark.read.parquet(d).collect()}

    n = compact_parquet(spark, d, target_file_bytes=64 * 1024,
                        sort_by=["event_id"])
    files = glob.glob(d + "/*.parquet")
    assert len(files) == n < 64
    after_df = spark.read.parquet(d)
    assert {r["event_id"] for r in after_df.collect()} == before

    # clustering restored: per-file event_id ranges are disjoint
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        st = meta.row_group(0).column(0).statistics
        ranges.append((st.min, st.max))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_compact_parquet_repairs_interrupted_swap(spark, sf_smoke, tmp_path):
    """Crash-recovery contract: if a previous run died between the two
    swap renames (data under `._old`, nothing at `path`), the next
    call restores and proceeds; stale temp/backup dirs are discarded.
    Partitioned layouts are refused outright."""
    import glob
    import os

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        compact_parquet,
    )

    d = str(tmp_path / "data")
    ev = load(spark, sf_smoke, "events").select("event_id", "user_id")
    ev.repartition(16).write.mode("overwrite").parquet(d)
    before = {r["event_id"] for r in spark.read.parquet(d).collect()}

    # simulate a crash between the two renames
    os.rename(d, d + "._old")
    os.makedirs(d + "._compacting")  # stale temp too
    n = compact_parquet(spark, d, target_file_bytes=256 * 1024)
    assert n == len(glob.glob(d + "/*.parquet"))
    assert {r["event_id"] for r in spark.read.parquet(d).collect()} == before
    assert not os.path.exists(d + "._old")
    assert not os.path.exists(d + "._compacting")

    # partitioned layout is refused
    part = str(tmp_path / "partitioned")
    ev.withColumn("b", F.col("event_id") % 2).write.partitionBy(
        "b"
    ).mode("overwrite").parquet(part)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partitioned"):
        compact_parquet(spark, part)


def test_analyze_table_stats_feed_the_optimizer(spark, sf_smoke):
    """ANALYZE TABLE COMPUTE STATISTICS: catalog row/size stats are
    the input the cost-based pieces of Catalyst (join selection,
    reorder) consume. Pins that (1) the stats land in the catalog and
    (2) a scan of the analyzed table carries the exact row count into
    the optimized plan's statistics — the number a 100 TB planner
    decides broadcastability with."""
    import uuid as _uuid

    table = f"stats_events_{_uuid.uuid4().hex[:8]}"
    n = load(spark, sf_smoke, "events").count()
    load(spark, sf_smoke, "events").write.saveAsTable(table)
    try:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        assert "Statistics" in desc, "ANALYZE left no catalog statistics"
        assert f"{n} rows" in desc["Statistics"]
        # row counts reach plan statistics only under the cost-based
        # optimizer; size-only estimation is the (default) fallback
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table(table)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert int(stats.rowCount().get()) == n, stats.toString()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_rebalance_hint_plans_aqe_rebalance(spark, sf_smoke):
    """/*+ REBALANCE */: AQE's write-path leveler — repartitions to
    even-sized outputs, splitting skewed partitions (plain
    repartition(n) can't) and coalescing tiny ones; the pre-write
    answer to the small-files problem at 100 TB. Pins that the hint
    survives into the optimized plan as RebalancePartitions."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        register_all,
    )

    register_all(spark, sf_smoke, tables=["orders"])
    df = spark.sql(
        "SELECT /*+ REBALANCE(o_orderdate) */ o_orderkey, o_orderdate "
        "FROM orders"
    )
    optimized = (
        df._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "RebalancePartitions" in optimized.replace(
        "rebalancepartitions", "RebalancePartitions"
    ), optimized


def test_snapshot_table_versions_rollback_and_isolation(
    spark, sf_smoke, tmp_path
):
    """Versioned snapshot table: every write is an immutable version
    committed by an atomic manifest flip — reads pin any committed
    version, rollback is a manifest edit, and an uncommitted writer
    directory is invisible to readers."""
    import os

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        read_snapshot_version,
        rollback_snapshot,
        write_snapshot,
    )

    tdir = str(tmp_path / "snap")
    nation = load(spark, sf_smoke, "nation")
    v1 = write_snapshot(nation.filter("n_nationkey < 10"), tdir)
    v2 = write_snapshot(nation, tdir)
    assert (v1, v2) == (1, 2)
    assert read_snapshot_version(tdir) == 2

    assert read_snapshot(spark, tdir).count() == nation.count()
    assert read_snapshot(spark, tdir, version=1).count() == 10

    # a crashed writer: data directory exists, manifest never flipped
    nation.limit(1).write.parquet(os.path.join(tdir, "v=3"))
    assert read_snapshot_version(tdir) == 2
    assert read_snapshot(spark, tdir).count() == nation.count()
    try:
        read_snapshot(spark, tdir, version=3)
        raise AssertionError("uncommitted version must not be readable")
    except ValueError:
        pass

    rollback_snapshot(tdir, 1)
    assert read_snapshot(spark, tdir).count() == 10
    # rollback is metadata-only: v2 data still present and pinnable
    assert read_snapshot(spark, tdir, version=2).count() == nation.count()


def test_snapshot_vacuum_keeps_current_and_recent(spark, sf_smoke, tmp_path):
    """Vacuum removes old version data but never the current pointer
    (even if rolled back) nor the newest keep_last versions."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        rollback_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    tdir = str(tmp_path / "snapgc")
    nation = load(spark, sf_smoke, "nation")
    for k in (5, 10, 15, 20):
        write_snapshot(nation.filter(f"n_nationkey < {k}"), tdir)
    rollback_snapshot(tdir, 2)

    removed = vacuum_snapshots(tdir, keep_last=2)
    assert removed == [1]  # v2 is current (protected), v3/v4 recent
    assert read_snapshot(spark, tdir).count() == 10  # current intact
    assert read_snapshot(spark, tdir, version=3).count() == 15
    try:
        read_snapshot(spark, tdir, version=1).count()
        raise AssertionError("vacuumed version should not read")
    except Exception:
        pass


def test_observed_write_collects_metrics_in_one_action(
    spark, sf_smoke, tmp_path
):
    """write_parquet_observed must deliver exact quality metrics from
    the SAME action as the write (no second scan), matching a
    recomputation over the written output."""
    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        write_parquet_observed,
    )

    out = str(tmp_path / "observed")
    ev = load(spark, sf_smoke, "events")
    metrics = write_parquet_observed(
        ev,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_errors": F.sum(
                (F.col("event_type") == "error").cast("long")
            ),
            "value_cents": F.sum(
                F.round(F.col("value") * 100).cast("long")
            ),
        },
    )
    back = spark.read.parquet(out)
    assert metrics["n_rows"] == back.count()
    re = back.agg(
        F.sum((F.col("event_type") == "error").cast("long")).alias("e"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).first()
    assert metrics["n_errors"] == re["e"]
    assert metrics["value_cents"] == re["c"]


def test_snapshot_writer_reclaims_crashed_orphan(spark, sf_smoke, tmp_path):
    """A writer that died after materializing v=N but before the
    manifest flip must not poison the table: since ``latest`` is
    monotonic, the next writer's target can only collide with that
    uncommitted orphan, so it overwrites it and commits normally."""
    import os

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        write_snapshot,
    )

    tdir = str(tmp_path / "snap_orphan")
    nation = load(spark, sf_smoke, "nation")
    assert write_snapshot(nation.filter("n_nationkey < 5"), tdir) == 1
    # crashed writer: v=2 data exists, manifest never flipped
    nation.limit(1).write.parquet(os.path.join(tdir, "v=2"))
    # next writer reclaims the orphan instead of raising forever
    assert write_snapshot(nation, tdir) == 2
    assert read_snapshot(spark, tdir).count() == nation.count()


def test_snapshot_txn_ledger_makes_replay_exactly_once(
    spark, sf_smoke, tmp_path
):
    """The (txn_app_id, txn_version) ledger: a replayed batch id is a
    no-op (returns 0, no new version), a fresh batch id commits, and
    rollback preserves the ledger so replays stay deduplicated."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot_version,
        rollback_snapshot,
        write_snapshot,
    )

    tdir = str(tmp_path / "snap_txn")
    nation = load(spark, sf_smoke, "nation")
    assert write_snapshot(nation, tdir, "q1", 0) == 1
    # restart-and-replay of batch 0: skipped, version unchanged
    assert write_snapshot(nation, tdir, "q1", 0) == 0
    assert read_snapshot_version(tdir) == 1
    # fresh batch commits; an unrelated app id is independent
    assert write_snapshot(nation, tdir, "q1", 1) == 2
    assert write_snapshot(nation, tdir, "q2", 0) == 3
    rollback_snapshot(tdir, 1)
    # ledger survives the rollback: replaying batch 1 is still a no-op
    assert write_snapshot(nation, tdir, "q1", 1) == 0


def test_snapshot_writer_never_clobbers_committed_data(
    spark, sf_smoke, tmp_path
):
    """The two destroy-committed-data scenarios must fail LOUDLY:
    (a) a version directory the manifest says is committed (simulated
    concurrent writer) is never overwritten; (b) a table whose
    manifest is lost but which still holds version dirs refuses
    writes entirely."""
    import os

    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        write_snapshot,
    )

    nation = load(spark, sf_smoke, "nation")

    # (a) the lost race: writer B reads latest=1, then writer A commits
    # v=2 before B reaches its rename. Simulate B's stale initial read
    # with a mock (first _read_manifest call returns the pre-commit
    # manifest; the collision-time re-read sees the truth on disk).
    from unittest import mock

    from big_data_backblaze_hard_drive_failure_spark.sources import sinks

    tdir = str(tmp_path / "snap_race")
    write_snapshot(nation.filter("n_nationkey < 5"), tdir)
    write_snapshot(nation.filter("n_nationkey < 9"), tdir)  # A's v=2
    stale = {"current": 1, "latest": 1}
    real_read = sinks._read_manifest
    with mock.patch.object(
        sinks,
        "_read_manifest",
        side_effect=lambda d, _calls=iter([stale]): next(
            _calls, real_read(d)
        ),
    ):
        try:
            write_snapshot(nation, tdir)
            raise AssertionError("must not clobber a committed v=2")
        except RuntimeError:
            pass
    # the committed v=2 data is untouched
    assert read_snapshot(spark, tdir, version=2).count() == 9

    # (b) lost manifest over surviving version dirs
    tdir2 = str(tmp_path / "snap_lost")
    write_snapshot(nation, tdir2)
    os.remove(os.path.join(tdir2, "_manifest.json"))
    try:
        write_snapshot(nation, tdir2)
        raise AssertionError("must refuse a manifest-less table")
    except RuntimeError:
        pass


def test_fan_out_small_scan_fires_only_under_one_split(spark, sf_smoke):
    """Round-13 single-split fan-out (sources/catalog._fan_out_small_scan):

    (a) on a table smaller than one scan split it hash-repartitions on
        the given key to the session shuffle width — the CPU-heavy map
        work after the scan (tokenize/md5) runs on every core instead
        of the one task an unsplittable single-row-group parquet file
        yields — and the row set is EXACTLY the plain load's;
    (b) when the table does NOT fit in one split (simulated by
        shrinking maxPartitionBytes below the file size) it is a
        no-op: no exchange is added, the plan is the plain scan —
        the production-scale behavior;
    (c) the SPARK_GRAFT_NO_FANOUT escape hatch disables it.
    """
    import os

    plain = load(spark, sf_smoke, "documents")
    fanned = load(spark, sf_smoke, "documents", fan_out_by=("doc_id",))
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # (a) exchange on doc_id at the session width, same rows
    p = _plan(fanned)
    assert "Exchange hashpartitioning(doc_id" in p, p
    assert f", {width})" in p.split("Exchange hashpartitioning(doc_id", 1)[1][:40], p
    assert sorted(r.doc_id for r in fanned.select("doc_id").collect()) == sorted(
        r.doc_id for r in plain.select("doc_id").collect()
    )
    # downstream groupBy on the fan-out key reuses the partitioning:
    # exactly ONE exchange in scan -> fan-out -> groupBy(doc_id)
    agged = fanned.groupBy("doc_id").count()
    assert _plan(agged).count("Exchange") == 1, _plan(agged)

    # (b) bigger-than-one-split input: no-op (no exchange)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        noop = load(spark, sf_smoke, "documents", fan_out_by=("doc_id",))
        assert "Exchange" not in _plan(noop), _plan(noop)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # (c) escape hatch — restore any pre-existing value, don't delete it
    prior = os.environ.get("SPARK_GRAFT_NO_FANOUT")
    os.environ["SPARK_GRAFT_NO_FANOUT"] = "1"
    try:
        off = load(spark, sf_smoke, "documents", fan_out_by=("doc_id",))
        assert "Exchange" not in _plan(off), _plan(off)
    finally:
        if prior is None:
            os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        else:
            os.environ["SPARK_GRAFT_NO_FANOUT"] = prior

    # (d) unparsable session confs (suffixed sizes like "128m") must
    # fall back to the plain scan, not raise (round-14 ADVICE fix)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        suff = load(spark, sf_smoke, "documents", fan_out_by=("doc_id",))
        assert "Exchange" not in _plan(suff), _plan(suff)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
