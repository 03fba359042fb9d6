"""Remaining TPC-H query shapes, adapted to the fixture schema.

``plans/star.py`` already covers Q1/Q3/Q7/Q8/Q10/Q12/Q13/Q14/Q15/Q17
(SQL-string form)/Q19/Q22; this module completes the 22-shape suite
with Q2/Q4/Q5/Q6/Q9/Q11/Q16/Q17 (DataFrame form)/Q18/Q20/Q21. The
fixture has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so shapes that need them
are adapted (each docstring says how) while keeping the *query
structure* — the joins, subquery kinds, and aggregation patterns —
faithful to the original.

All [beyond-reference]: the reference pipeline is single-table
(SURVEY.md §2.3) and has none of these shapes.

Scale design (100 TB):
  * only FIXED-cardinality dimensions (nation = 25, region = 5 —
    constant at every SF by the TPC-H data model) are explicitly
    ``broadcast()``; ``customer``, ``supplier`` and ``part`` all
    SCALE linearly with the data, so their joins are deliberately
    UNHINTED: AQE broadcasts them from runtime stats while they fit
    and shuffles them when they don't (a static broadcast hint is
    executed eagerly from Catalyst's size estimate and OOMs before
    AQE can demote it — the round-10 sf1 parity rotation caught
    exactly that failure in q18's ``broadcast(customer)``; round 13
    removed the same hint class from 14 supplier/part joins, and
    ``tests/test_plan_hygiene.py::_SCALING_TABLE_SIG`` now gates all
    seven scaling tables);
  * fact-fact joins (lineitem ⋈ orders, lineitem self-joins) are
    equi-keyed on ``l_orderkey`` so Catalyst sort-merges and AQE can
    split skewed keys; where Catalyst's column-pruned size estimate
    is small enough to statically pick a broadcast of an SF-scaling
    side (q18's orders ⋈ filtered-lineitem-agg, q21's lineitem ⋈
    orders — both OOM'd a 1g session at sf1), the join carries an
    explicit ``hint("merge")``: sort-merge spills, broadcast builds
    don't;
  * money stays in exact integer cents until the final division, so
    partial-aggregation order cannot perturb a single bit (the same
    discipline as ``plans.star`` — see SURVEY §7);
  * EXISTS / NOT EXISTS become left-semi / left-anti joins — never a
    per-row subquery re-execution;
  * scalar "fraction of global total" thresholds (Q11) are
    cross-multiplied integer comparisons against a broadcast 1-row
    aggregate — no float epsilon, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load
from . import query


def _cents(col: str) -> Column:
    return F.round(F.col(col) * 100).cast("long")


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp_ntz")


# --------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part within a region.
# Adaptation: no partsupp, so "supply cost" is the minimum price (in
# exact cents) at which the supplier ever sold the part (lineitem as
# the part-supplier relationship). The distinctive Q2 structure —
# an aggregated part×supplier relation filtered to the per-part
# minimum, with region-scoped suppliers — is intact; the per-part
# argmin is a rank-1 window (WindowGroupLimit pushdown) instead of a
# correlated MIN subquery, with (cost, suppkey) as the deterministic
# tie-break.
# --------------------------------------------------------------------
@query(
    "tpch_q02_min_cost_supplier",
    oracle="""
    WITH sc AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name, cost_c
    FROM sc
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 5
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY p_partkey ORDER BY cost_c, l_suppkey) = 1
    """,
)
def tpch_q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_cents("l_extendedprice")).alias("cost_c"))
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_name")
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("p_partkey").orderBy("cost_c", "l_suppkey")
    return (
        sc.join(part, sc.l_partkey == part.p_partkey)
        .join(supp, sc.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", "n_name", "cost_c")
    )


# --------------------------------------------------------------------
# Q4 shape: order-priority checking. Adaptation: "committed late"
# (l_commitdate < l_receiptdate) becomes "shipped more than 60 days
# after ordering" — same EXISTS-correlated-to-the-outer-order
# structure, realized as a left-semi join whose condition mixes the
# equi key with a non-equi timestamp predicate.
# --------------------------------------------------------------------
@query(
    "tpch_q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-07-01"))
            & (F.col("o_orderdate") < _ts("1996-10-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------
# Q5 shape: local-supplier volume — the 6-table join where the
# customer's nation must EQUAL the supplier's nation (the join graph
# has a cycle, which is what makes Q5 interesting). Exact-cents
# revenue by nation for one region + one order year.
# --------------------------------------------------------------------
@query(
    "tpch_q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("rev_e4"),
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum("rev_e4") / 10000.0).alias("revenue"))
    )


# --------------------------------------------------------------------
# Q6 shape: forecasting-revenue-change — pure filter + single
# aggregate, the canonical "does the predicate reach the scan" probe.
# The discount band is filtered in integer cents (5..7), not floats,
# so the selection is bit-exact in both engines.
# --------------------------------------------------------------------
@query(
    "tpch_q06_revenue_change",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def tpch_q06_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc_c = _cents("l_discount")
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents("l_extendedprice") * disc_c) / 10000.0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year. Adaptation: no
# partsupp, so supply cost is modeled as 60% of the part's retail
# price — profit = disc_price − 0.6·retail·qty, all in exact 1e-4
# dollar units so the grouped sums are integer-exact.
# --------------------------------------------------------------------
@query(
    "tpch_q09_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
               - 60 * CAST(ROUND(p_retailprice * 100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", _cents("p_retailprice").alias("retail_c"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty_l"),
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "disc_e4"
        ),
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(
                    F.col("disc_e4") - 60 * F.col("retail_c") * F.col("qty_l")
                )
                / 10000.0
            ).alias("profit")
        )
    )


# --------------------------------------------------------------------
# Q11 shape: important stock — per-part value restricted to one
# nation group's suppliers (a single nation is empty at sf0.001), kept only when above a fraction of the GLOBAL
# total. The global scalar is a broadcast 1-row aggregate and the
# threshold test is a cross-multiplied integer comparison
# (value·1000 > total), so no float fraction ever appears.
# --------------------------------------------------------------------
@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS value_c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_nationkey % 3 = 0
        GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(value_c) AS total_c FROM val)
    SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
    FROM val, tot
    WHERE value_c * 1000 > total_c
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 3 == 0
    )
    from ..operators.staging import stage_boundary

    # val feeds both the grand total and the share filter — unstaged,
    # the lineitem⋈supplier⋈nation pipeline ran twice (round-13 scan
    # sweep: lineitem/supplier/nation each x2). Staged (O(parts)
    # rows), one pass.
    val = stage_boundary(
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (_cents("l_extendedprice") * F.col("l_quantity").cast("long")).alias(
                "vc"
            ),
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("vc").alias("value_c")),
        materialize=False,
    )
    tot = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select("l_partkey", "value_c")
    )


# --------------------------------------------------------------------
# Q16 shape: supplier variety per part attribute. Adaptation: the
# part-supplier relation is DISTINCT (l_partkey, l_suppkey) pairs
# from lineitem; the excluded-supplier NOT IN subquery (complaints in
# TPC-H) becomes "suppliers with negative account balance", realized
# as a left-anti join.
# --------------------------------------------------------------------
@query(
    "tpch_q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) psl
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    psl = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        psl.join(bad, psl.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------
# Q17 shape, full DataFrame form (star_correlated_subquery is the
# SQL-string variant): revenue from small-quantity orders of one
# brand's parts. The correlated 0.2·AVG subquery is decorrelated into
# a per-part pre-aggregate; the comparison qty < 0.2·(sum/cnt) is
# cross-multiplied to qty·5·cnt < sum — exact integers, no division.
# --------------------------------------------------------------------
@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS BIGINT)) AS sq,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 700.0
               AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa   ON l_partkey = pk
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS BIGINT) * 5 * cnt < sq
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 rewrite (self-join sweep catch #4): the per-part
    # sum/count used to be a groupBy over the ENTIRE lineitem table
    # joined back to the Brand#3-filtered rows — Catalyst cannot push
    # the part semi-join into the aggregate side, so the old plan
    # scanned lineitem twice and aggregated ~25x more parts than the
    # brand filter keeps. Filtering FIRST (the part join keeps
    # every lineitem OF a surviving part, so per-part aggregates are
    # unchanged), then computing sum/cnt as WINDOW aggregates over
    # partition-by-partkey: one lineitem scan, one partkey shuffle,
    # no aggregate-join-back for a planner to mis-size. Both window
    # expressions share one select -> a single Window node.
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        li.select(
            "l_partkey",
            "l_quantity",
            _cents("l_extendedprice").alias("price_c"),
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "l_quantity",
            "price_c",
            F.sum(F.col("l_quantity").cast("long")).over(w).alias("sq"),
            F.count(F.lit(1)).over(w).alias("cnt"),
        )
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sq")
        )
        .agg(
            (F.sum("price_c") / 700.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------
# Q18 shape: large-volume customers — the group-by-HAVING-over-a-fact
# feeding a join back to orders/customer, with a deterministic
# ordered top-100 (sort key includes o_orderkey so the LIMIT cut is
# identical in both engines).
# --------------------------------------------------------------------
@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0
               AS total_price,
           sum_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) big
      ON o_orderkey = l_orderkey
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (_cents("o_totalprice") / 100.0).alias("total_price"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big.hint("merge"), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "total_price", "sum_qty",
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------
# Q20 shape: part promotion — suppliers who moved enough of a named
# part family in a year. The nested IN subqueries become a grouped
# HAVING aggregate consumed through a left-semi join.
# --------------------------------------------------------------------
@query(
    "tpch_q20_part_promotion",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 350
    )
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    movers = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(red, F.col("l_partkey") == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("moved"))
        .filter(F.col("moved") > 350)
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supp.join(
            movers, supp.s_suppkey == movers.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


# --------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting. Adaptation: "late"
# is shipping >30 days after the order date (no receipt/commit
# dates); the supplier must be the strictly-latest shipper in a
# multi-supplier finalized order.
#
# Round-12 rewrite (the bounded-group class, found by the self-join
# sweep): EXISTS / NOT EXISTS used to be a left-semi plus a left-anti
# self-join of the fact table on l_orderkey — lineitem scanned three
# times and shuffled three times. An order carries a BOUNDED number
# of lineitems (<= 7, TPC-H data model — the same bound
# star_triangle_count's edge build leans on), so both subqueries
# collapse into ONE per-order collect_list of (suppkey, shipdate)
# structs evaluated map-side per l1 row:
#   EXISTS other supplier      -> size(filter(lis, sk <> mine)) > 0
#   NOT EXISTS later shipper   -> no element of that filter has
#                                 sd > my shipdate
# lineitem is now scanned twice and shuffled twice (orders merge
# join + the per-order groupBy); the join-back streams l1 — already
# orderkey-sorted from the merge join — against the MERGE-hinted
# roster (static broadcast of a corpus-scaling aggregate is the
# q18/q21/jaccard OOM class, and shuffle_hash died in the hash
# build at sf1: roster rows drag arrays, SHJ builds don't spill —
# the jaccard verify-join contract). Bit-identical output, MATCH
# re-proven at sf0.01 + fuzz + sf1 (PARITY_SF1_r12.log, A/B in
# scripts/q21_ab_r12.py); NULL semantics pinned to the old
# anti-join's: a NULL shipdate comparison is "no match" (row
# survives NOT EXISTS), hence the coalesce(exists, false) —
# F.exists returns NULL, not false, when no element is true but
# some comparison is NULL.
# --------------------------------------------------------------------
@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey, l_shipdate
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l1 = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .alias("l1")
    )
    # per-order lineitem roster, bounded <= 7 structs by the data
    # model; l_orderkey is a non-null PK there, so no null-key basket
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_suppkey").alias("sk"),
                F.col("l_shipdate").alias("sd"),
            )
        ).alias("lis")
    )
    # hint("merge"), NOT shuffle_hash: the roster rows each drag a
    # <= 7-struct array, and SHJ hash builds don't spill where SMJ
    # sorts do — the same contract as jaccard's verify joins, and
    # exactly how the first sf1 run of this rewrite died (hash build
    # OOM under the 8g envelope). SMJ also reuses l1's existing
    # orderkey sort from the merge-pinned orders join.
    j = l1.join(per_order.hint("merge"), "l_orderkey")
    # elements whose sk comparison is NULL drop out of the filter —
    # identical to the old semi/anti's "NULL condition = no match"
    others = F.filter("lis", lambda x: x["sk"] != F.col("l_suppkey"))
    later = F.coalesce(
        F.exists(others, lambda x: x["sd"] > F.col("l_shipdate")),
        F.lit(False),
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        j.filter((F.size(others) > 0) & ~later)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
