"""Star-schema queries: joins, set ops, grouping sets, top-k, pivot.

The reference pipeline is single-table — it has NO joins (SURVEY.md
§2.3) — but a complete engine must cover them, and the driver's TPC-H
style fixtures exercise exactly this surface. All [beyond-reference].

Scale design notes (100 TB):
  * only FIXED-cardinality dimension joins (nation = 25, region = 5)
    are explicitly ``broadcast()``; customer/supplier/part SCALE with
    the data and are deliberately UNHINTED — AQE broadcasts them from
    runtime stats while they fit, shuffles them when they don't
    (static hints build eagerly and OOM at scale before AQE can
    demote: the round-10 q18 ``broadcast(customer)`` failure, and
    round 13's removal of 14 supplier/part hints — gated by
    ``tests/test_plan_hygiene.py::_SCALING_TABLE_SIG``);
  * fact-fact joins (lineitem ⋈ orders) are equi-joins on the key
    Catalyst sort-merges; AQE handles skew splitting;
  * revenue aggregates use exact integer cents (see plans.reference)
    so partial aggregation order cannot perturb results;
  * top-k uses window rank with rank-limit pushdown (WindowGroupLimit)
    rather than a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_group
from ..sources.catalog import load, register_all
from . import query


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------
# TPC-H Q1 shape: scan + filter + 8-agg groupBy (pricing summary).
# Shows filter pushdown into the parquet scan + partial aggregation.
# --------------------------------------------------------------------
@query(
    "star_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
               AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
               AS sum_disc_price,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
               * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) / 1000000.0
               AS sum_charge,
           SUM(CAST(l_quantity AS BIGINT)) / (COUNT(*) * 1.0) AS avg_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               / (COUNT(*) * 100.0) AS avg_price,
           SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
               / (COUNT(*) * 100.0) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def star_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    qty_l = F.col("l_quantity").cast("long")
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_l).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)) / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)) / 1000000.0).alias(
                "sum_charge"
            ),
            (F.sum(qty_l) / (F.count(F.lit(1)) * 1.0)).alias("avg_qty"),
            (F.sum(price_c) / (F.count(F.lit(1)) * 100.0)).alias("avg_price"),
            (F.sum(disc_c) / (F.count(F.lit(1)) * 100.0)).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# 5-table star join: fact ⋈ fact ⋈ broadcast dims, grouped revenue.
# --------------------------------------------------------------------
@query(
    "star_revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", (price_c * (100 - disc_c)).alias("rev_e4")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum("rev_e4") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# Q3 shape: join + grouped revenue + deterministic global top-10.
# --------------------------------------------------------------------
@query(
    "star_top_orders",
    oracle="""
    WITH rev AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                   AS rev_e4
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(o_orderdate AS DATE) AS order_day,
           rev_e4 / 10000.0 AS revenue
    FROM rev JOIN orders ON l_orderkey = o_orderkey
    ORDER BY rev_e4 DESC, o_orderkey LIMIT 10
    """,
)
def star_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(price_c * (100 - disc_c)).alias("rev_e4"))
    )
    orders = load(spark, sf_dir, "orders")
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .orderBy(F.col("rev_e4").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.to_date("o_orderdate").alias("order_day"),
            (F.col("rev_e4") / 10000.0).alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------
@query(
    "star_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def star_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@query(
    "star_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def star_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


# --------------------------------------------------------------------
# Left outer join preserving zero-order customers
# --------------------------------------------------------------------
@query(
    "star_left_join_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def star_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-aggregate orders per custkey BEFORE the left join: the join
    # then sees <=1 row per customer on each side (one wide shuffle on
    # the fact, tiny join), instead of shuffling the full orders table
    # into the join and re-shuffling the joined result to group — the
    # shape that hurts at 100x on a skewed custkey.
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # shuffle_hash hint: per_cust is O(customers); the pruned-column
    # estimate statically broadcast it at sf1 — same class as the
    # removed broadcast(customer) hints
    return cust.join(
        per_cust.hint("shuffle_hash"),
        cust.c_custkey == per_cust.o_custkey,
        "left",
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
    )


# --------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT (distinct semantics)
# --------------------------------------------------------------------
@query(
    "star_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def star_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    full_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_c.intersect(full_c)


@query(
    "star_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    full_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep duplicates)
    return open_c.subtract(full_c)


# --------------------------------------------------------------------
# ROLLUP / CUBE grouping sets
# --------------------------------------------------------------------
@query(
    "star_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("acctbal_sum"),
        )
    )


@query(
    "star_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def star_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# Top-k per group — the reference's missing "Top-K/day alert budget"
# (readme.md:205-208), via the topk operator (WindowGroupLimit path)
# --------------------------------------------------------------------
@query(
    "star_topk_per_segment",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rank
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rank <= 3
    """,
)
def star_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    top = top_k_per_group(
        joined,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    return top.select("c_mktsegment", "o_orderkey", "o_totalprice", "rank")


# --------------------------------------------------------------------
# rank / dense_rank windows (ties share ranks — deterministic)
# --------------------------------------------------------------------
@query(
    "star_window_rank",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC)
               AS bal_dense_rank
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def star_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc())
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
        )
    )


# --------------------------------------------------------------------
# Pivot (conditional aggregation shape shared with the oracle)
# --------------------------------------------------------------------
@query(
    "star_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_partial
    FROM orders GROUP BY o_orderpriority
    """,
)
def star_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .withColumnsRenamed({"O": "n_open", "F": "n_full", "P": "n_partial"})
    )


# --------------------------------------------------------------------
# Correlated-subquery SQL surface: the engine accepts SQL strings too
# (spark.sql over registered views; identical text runs on DuckDB)
# --------------------------------------------------------------------
_EXISTS_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders_with_max_qty
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity = 50)
GROUP BY o_orderstatus
"""


@query("star_exists_sql", oracle=_EXISTS_SQL)
def star_exists_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["orders", "lineitem"])
    return spark.sql(_EXISTS_SQL)


# --------------------------------------------------------------------
# Distinct aggregation
# --------------------------------------------------------------------
@query(
    "star_distinct_customers",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def star_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# --------------------------------------------------------------------
# As-of join [beyond-reference, SURVEY §2.3]: for each 'click' event,
# the most recent 'error' value of the same user at or before its ts.
#
# Spark has no ASOF JOIN operator; a range join (c.ts >= e.ts) would
# be O(n*m) per user. The scalable re-expression is union + window:
# tag both sides, sort per user by (ts, side, event_id) — errors
# before clicks at equal ts, matching ASOF's >= bound — and carry the
# last error value forward with last_value(ignorenulls). ONE hash
# exchange on user_id + one local sort, identical cost to any other
# window query; no join blow-up at any scale.
#
# Right side is deduped to one error per (user, ts) (max event_id
# wins) so the as-of match is deterministic in both engines.
# --------------------------------------------------------------------
@query(
    "star_asof_join",
    oracle="""
    WITH err AS (
        SELECT user_id, ts, arg_max(value, event_id) AS err_value
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, e.err_value AS last_error_value
    FROM clicks c
    ASOF LEFT JOIN err e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def star_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(value, event_id)").alias("err_value"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(0).alias("side"),
            "err_value",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("double").alias("err_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = err.unionByName(clicks).withColumn(
        "last_error_value",
        F.last("err_value", ignorenulls=True).over(w),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "last_error_value"
    )


# --------------------------------------------------------------------
# GROUPING SETS [beyond-reference]: explicit set list (rollup/cube's
# general form). One scan; Spark expands the sets in a single
# Expand + hash aggregate — no per-set rescans.
# --------------------------------------------------------------------
# CAST on the divisor: Spark SQL parses a bare 100.0 literal as
# DECIMAL (-> Decimal result), DuckDB as DOUBLE; the cast unifies them
_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           / CAST(100.0 AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


@query("star_grouping_sets", oracle=_GROUPING_SETS_SQL)
def star_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["orders"])
    return spark.sql(_GROUPING_SETS_SQL)


# --------------------------------------------------------------------
# Range join [beyond-reference]: fact values joined to a small static
# band table on lo <= v < hi. The band side is tiny and broadcast, so
# the range predicate is evaluated map-side against each broadcast row
# (BroadcastNestedLoopJoin) — the correct plan when one side is small.
# For big-big range joins the scale path is banding both sides to an
# equi-key (bucket id) first, exactly like the LSH designs in
# plans/datapipe.py.
# --------------------------------------------------------------------
@query(
    "star_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 80.0), ('mid', 80.0, 160.0),
               ('high', 160.0, 1e9)
    )
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def star_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        [("low", 0.0, 80.0), ("mid", 80.0, 160.0), ("high", 160.0, 1e9)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------
# Ranking-function batch [beyond-reference]: rank / dense_rank /
# ntile / percent_rank / cume_dist share one window (one exchange,
# one sort). Unique tie-break (totalprice, orderkey) makes ntile and
# cume_dist deterministic cross-engine.
# --------------------------------------------------------------------
@query(
    "star_window_funcs",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                          o_orderkey)
    """,
)
def star_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.round(F.col("o_totalprice") * 100).cast("long").desc(),
        F.col("o_orderkey"),
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


# --------------------------------------------------------------------
# HLL sketch: approx_count_distinct — the O(1)-memory distinct count
# for 100 TB cardinality estimation. Sketch internals are
# engine-specific -> rows-only here; tests/test_scale_layout.py-style
# accuracy bound lives in tests/test_operators.py.
# --------------------------------------------------------------------
@query("star_approx_distinct")
def star_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias(
            "approx_customers"
        ),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


# --------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): lineitems priced below
# 50% of their part's average quantity. Catalyst decorrelates the
# subquery into an aggregate + join — no per-row re-execution.
# --------------------------------------------------------------------
_CORRELATED_SQL = """
SELECT l_partkey,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l1
WHERE l_quantity < (
    SELECT 0.5 * SUM(CAST(l_quantity AS BIGINT))
               / (COUNT(*) * CAST(1.0 AS DOUBLE))
    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
GROUP BY l_partkey
"""


@query("star_correlated_subquery", oracle=_CORRELATED_SQL)
def star_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["lineitem"])
    return spark.sql(_CORRELATED_SQL)


# --------------------------------------------------------------------
# Disjunctive multi-clause predicate (TPC-H Q19 shape): OR of AND
# blocks — exercises predicate normalization/pushdown of non-trivial
# boolean trees.
# --------------------------------------------------------------------
@query(
    "star_disjunctive_filter",
    oracle="""
    SELECT COUNT(*) AS n,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
               AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 15 AND l_quantity <= 40)
    """,
)
def star_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _cents("l_extendedprice").alias("price_c")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(15, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("price_c") / 100.0).alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# Multiset set-ops: EXCEPT ALL / INTERSECT ALL (bag semantics — keep
# duplicates; star_except/star_intersect cover the distinct forms).
# --------------------------------------------------------------------
@query(
    "star_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def star_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.filter("o_orderstatus = 'O'").select(
        F.col("o_custkey").alias("custkey")
    )
    f = orders.filter("o_orderstatus = 'F'").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.exceptAll(f)


# --------------------------------------------------------------------
# Unpivot / melt: wide -> long via stack() (DuckDB: UNPIVOT). The
# inverse of star_pivot_status.
# --------------------------------------------------------------------
@query(
    "star_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_p
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n
    FROM wide
    UNPIVOT (n FOR status IN (status_o, status_f, status_p))
    """,
)
def star_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    status = F.col("o_orderstatus")
    wide = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(status == "O", 1).otherwise(0)).alias("status_o"),
            F.sum(F.when(status == "F", 1).otherwise(0)).alias("status_f"),
            F.sum(F.when(status == "P", 1).otherwise(0)).alias("status_p"),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["status_o", "status_f", "status_p"],
        "status",
        "n",
    )


# --------------------------------------------------------------------
# Null semantics: null-safe equality (<=> / IS NOT DISTINCT FROM) and
# explicit NULLS FIRST ordering over the as-of join's nullable column.
# --------------------------------------------------------------------
@query(
    "star_null_semantics",
    oracle="""
    WITH err AS (
        SELECT user_id, ts, arg_max(value, event_id) AS err_value
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ),
    asof_j AS (
        SELECT c.event_id, c.user_id, e.err_value AS last_error_value
        FROM clicks c
        ASOF LEFT JOIN err e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    )
    SELECT CAST(SUM(CASE WHEN last_error_value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           CAST(SUM(CASE WHEN last_error_value IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe,
           CAST(COUNT(last_error_value) AS BIGINT) AS n_not_null,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM asof_j
    """,
)
def star_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = star_asof_join(spark, sf_dir)
    v = F.col("last_error_value")
    return asof.agg(
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(
            F.when(v.eqNullSafe(F.lit(None).cast("double")), 1).otherwise(0)
        ).alias("n_null_safe"),
        F.count(v).alias("n_not_null"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# TPC-H Q12 shape: conditional bucket counts after a fact-fact join —
# CASE-inside-SUM aggregation over joined priorities.
# --------------------------------------------------------------------
@query(
    "star_priority_buckets",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def star_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q14 shape: conditional-revenue ratio — numerator and
# denominator from ONE aggregation pass (exact cents).
# --------------------------------------------------------------------
@query(
    "star_promo_revenue_ratio",
    oracle="""
    SELECT SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev_e4 ELSE 0 END)
               * CAST(100.0 AS DOUBLE) / SUM(rev_e4) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
        SELECT p_type,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    """,
)
def star_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_e4"
        ),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(promo, F.col("rev_e4")).otherwise(0))
                * 100.0
                / F.sum("rev_e4")
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# Exact percentile aggregates: median / p90 per group (Spark
# `percentile` == DuckDB `quantile_cont`, linear interpolation). The
# exact form sorts per group — fine for bounded groups; swap to
# approx_percentile (t-digest, mergeable, O(1) memory) at 100 TB.
# --------------------------------------------------------------------
@query(
    "star_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def star_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias(
                "p90_price"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q3 shape (shipping priority): 3-table join, revenue =
# extendedprice*(1-discount) in EXACT integer ten-thousandths (cents
# of cents — two 2-decimal factors multiply into 4 exact decimals),
# top-10 unshipped orders by revenue. Catalyst broadcasts the filtered
# customer dim; the top-n is TakeOrderedAndProject. The classic
# join-agg-topk OLAP pattern at any scale.
# --------------------------------------------------------------------
@query(
    "star_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_day,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, order_day, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def star_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("date")
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_day"),
            "o_orderpriority",
        )
        .agg(
            (F.sum(price_c * (F.lit(100) - disc_c)) / 10000.0).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "order_day", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# TPC-H Q12 shape (late-shipment priority buckets): join + dual
# conditional aggregation — HIGH-priority vs other order counts per
# return flag for late-shipped lines. One shuffle, exact counts.
# --------------------------------------------------------------------
@query(
    "star_late_shipment_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate
    GROUP BY l.l_returnflag
    """,
)
def star_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q7 shape (volume shipping): two-nation trade flows by year.
# The nation dim is joined TWICE (customer side + supplier side), both
# hinted broadcast (fixed 25 rows); supplier is SF-scaling and
# deliberately unhinted (AQE broadcasts it while it fits — round 13).
# Revenue in exact ten-thousandths; one fact shuffle for the group-by.
# --------------------------------------------------------------------
@query(
    "star_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def star_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    pair_ok = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            (F.sum(price_c * (F.lit(100) - disc_c)) / 10000.0).alias("revenue")
        )
    )


# --------------------------------------------------------------------
# TPC-H Q10 shape (returned-item reporting): top 20 customers by
# revenue lost to returns in a quarter. Fact-fact join shuffles on
# orderkey; customer+nation dims broadcast; TakeOrderedAndProject
# caps the output without a global sort.
# --------------------------------------------------------------------
@query(
    "star_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def star_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .agg(
            (F.sum(price_c * (F.lit(100) - disc_c)) / 10000.0).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# TPC-H Q13 shape (customer distribution): a group-by OVER a group-by —
# orders per customer (left join keeps zero-order customers), then the
# histogram of those counts. Two shuffles by construction; the first
# is the only one proportional to data size.
# --------------------------------------------------------------------
@query(
    "star_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def star_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# --------------------------------------------------------------------
# TPC-H Q15 shape (top supplier): quarterly revenue per supplier, then
# the supplier(s) achieving the MAX — the max is compared in the EXACT
# integer ten-thousandths domain (never on a derived double), via a
# 1-row broadcast scalar subquery, so ties and equality are exact.
# --------------------------------------------------------------------
@query(
    "star_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                   AS total_rev_i
        FROM lineitem l
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1996-04-01'
        GROUP BY supplier_no
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev_i AS BIGINT) / 10000.0 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev_i = (SELECT MAX(total_rev_i) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def star_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    from ..operators.staging import stage_boundary

    # revenue feeds both the global-max side and the join-back side —
    # unstaged, the filtered lineitem scan + aggregate ran twice
    # (round-13 scan sweep: lineitem x2). Staged (O(suppliers) rows),
    # one pass.
    revenue = stage_boundary(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum(price_c * (F.lit(100) - disc_c)).alias("total_rev_i")
        ),
        materialize=False,
    )
    best = revenue.agg(F.max("total_rev_i").alias("best_rev_i"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best), F.col("total_rev_i") == F.col("best_rev_i"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_i").cast("long") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------
# TPC-H Q22 shape (dormant high-balance customers): a scalar-subquery
# threshold (global mean of positive balances) + NOT EXISTS anti-join.
# The threshold compare cross-multiplies in integer cents
# (bal_cents * n > sum_cents) so no float boundary can flip a row in
# either engine; the anti-join shuffles only custkeys.
# --------------------------------------------------------------------
@query(
    "star_dormant_customers",
    oracle="""
    WITH gstats AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer c, gstats g
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * g.n_pos > g.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def star_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # cust feeds the global positive-balance stats AND the threshold
    # filter — unstaged, the customer scan ran twice (round-13 scan
    # sweep). Staged (three pruned columns), one pass.
    cust = stage_boundary(
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        ),
        materialize=False,
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    glob = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_c).alias("sum_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    return (
        cust.crossJoin(F.broadcast(glob))
        .filter(bal_c * F.col("n_pos") > F.col("sum_cents"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_c) / 100.0).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------
# Spark 4 SQL scalar function (CREATE TEMPORARY FUNCTION ... RETURN):
# the engine's SQL-macro surface. The exact-cents revenue expression is
# defined ONCE as a catalog object and reused by name in plain SQL —
# Catalyst inlines the body, so the plan is identical to writing the
# expression out (no UDF boundary, full codegen). The DuckDB oracle
# inlines the same body (its macro layer is equivalent).
# --------------------------------------------------------------------
@query(
    "star_sql_function_revenue",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def star_sql_function_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import register_all

    register_all(spark, sf_dir, tables=["lineitem"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION rev_cents2(p DOUBLE, d DOUBLE)
        RETURNS BIGINT
        RETURN CAST(ROUND(p * 100) AS BIGINT)
               * (100 - CAST(ROUND(d * 100) AS BIGINT))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               -- bare 10000.0 parses as DECIMAL in Spark (DOUBLE in
               -- DuckDB) — cast so both engines divide identically
               SUM(rev_cents2(l_extendedprice, l_discount))
                   / CAST(10000.0 AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------
# TPC-H Q8 shape (national market share): the share of EUROPE's
# customer revenue supplied by NATION_18, by order year. Conditional
# numerator over an unconditional denominator, both as exact integer
# ten-thousandths; the final share divides the same two int64s in both
# engines -> bit-identical doubles with no rounding step. Six-table
# join: fixed-cardinality dims (nation x2, region) hinted broadcast,
# SF-scaling supplier unhinted (AQE-sized — round 13), one fact
# shuffle.
# --------------------------------------------------------------------
@query(
    "star_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_18'
                         THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                         ELSE 0 END) AS BIGINT) AS nation_rev_e4,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
               AS BIGINT) AS total_rev_e4,
           SUM(CASE WHEN n2.n_name = 'NATION_18'
                    THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    ELSE 0 END)
               / CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY o_year
    """,
)
def star_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_e4 = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_18", rev_e4).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("cn_region"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(nation_rev).alias("nation_rev_e4"),
            F.sum(rev_e4).alias("total_rev_e4"),
            (
                F.sum(nation_rev) / F.sum(rev_e4).cast("double")
            ).alias("mkt_share"),
        )
    )


# --------------------------------------------------------------------
# Salted skew join under the oracle: events joined to a 5-row dim on
# the (skewed) event_type key through operators/skew.py, aggregated
# back to exact counts. The salt spreads each hot key over 8 subtasks;
# the group-by collapses the salt, so the result is identical to a
# plain join — which is exactly what the DuckDB oracle computes.
# --------------------------------------------------------------------
@query(
    "star_salted_skew_join",
    oracle="""
    WITH dim AS (
        SELECT * FROM (VALUES ('click', 1), ('view', 1), ('purchase', 10),
                              ('signup', 5), ('error', -5))
               AS t(event_type, weight)
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d.weight) AS BIGINT) AS weight_sum
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def star_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    dim = spark.createDataFrame(
        [("click", 1), ("view", 1), ("purchase", 10),
         ("signup", 5), ("error", -5)],
        "event_type string, weight int",
    )
    joined = salted_join(
        load(spark, sf_dir, "events").select("event_type"),
        dim,
        on="event_type",
        n_salts=8,
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("weight").cast("long").alias("weight_sum"),
    )


# --------------------------------------------------------------------
# CDC merge/upsert (MERGE INTO semantics, latest-wins): apply a
# change set — price updates, new orders, deletes — over the orders
# snapshot via operators/merge.py, then checksum the merged state.
# The change set is derived deterministically from orders itself
# (disjoint key classes for update/insert/delete), so the oracle
# rebuilds the identical merge in SQL.
# --------------------------------------------------------------------
@query(
    "star_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
               1 AS version, 0 AS src, FALSE AS deleted
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) + 500 AS price_c,
               2 AS version, 1 AS src, FALSE AS deleted
        FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 53 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT), 1, 1, FALSE
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, CAST(0 AS BIGINT), 2, 1, TRUE
        FROM orders WHERE o_orderkey % 53 = 0
    ),
    merged AS (
        SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY k ORDER BY version DESC, src DESC) = 1
    )
    SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
    FROM merged WHERE NOT deleted GROUP BY st
    """,
)
def star_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert
    from ..operators.staging import stage_boundary

    # base + the three synthesized change streams all derive from the
    # same three orders columns — unstaged, the plan scanned orders
    # FOUR times (round-13 scan sweep), once per stream. Staged, one
    # pruned scan feeds all four (guide §2.4). In a real CDC deployment
    # base and changes are different tables; the rescans were an
    # artifact of synthesizing changes from the same fixture.
    orders = stage_boundary(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        materialize=False,
    )
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        _cents("o_totalprice").alias("price_c"),
        F.lit(1).alias("version"),
        F.lit(False).alias("deleted"),
    )
    price_updates = (
        orders.filter(
            (F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 53 != 0)
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
            (_cents("o_totalprice") + 500).alias("price_c"),
            F.lit(2).alias("version"),
            F.lit(False).alias("deleted"),
        )
    )
    inserts = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 1000000).alias("k"),
        F.col("o_orderstatus").alias("st"),
        _cents("o_totalprice").alias("price_c"),
        F.lit(1).alias("version"),
        F.lit(False).alias("deleted"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 53 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.lit(0).cast("long").alias("price_c"),
        F.lit(2).alias("version"),
        F.lit(True).alias("deleted"),
    )
    changes = price_updates.unionByName(inserts).unionByName(deletes)
    merged = merge_upsert(
        base, changes, keys=["k"], version_cols=["version"],
        tombstone="deleted",
    )
    return merged.groupBy("st").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price_c").cast("long").alias("total_c"),
    )


# --------------------------------------------------------------------
# Approximate percentiles (Greenwald-Khanna sketch): the scale path
# for quantiles — mergeable, bounded-memory, one pass — next to the
# exact percentile() the oracle can check (star_percentiles). The GK
# accuracy parameter trades memory for error; pytest pins the
# rank-error contract against the exact values. rows-only: DuckDB
# has no GK twin, so the driver gets the weaker check by design.
# --------------------------------------------------------------------
@query("star_approx_percentiles")
def star_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    acc = 10000  # 1/acc max rank error
    # Scalar columns only: the driver canonicalizes even rows-only
    # output with a pandas sort that cannot hash list cells, so the
    # two-quantile sketches are unpacked with element_at.
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], acc).alias("_ap"),
        F.expr("percentile(o_totalprice, array(0.5, 0.95))").alias("_ep"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "o_orderstatus",
        F.element_at("_ap", 1).alias("approx_p50"),
        F.element_at("_ap", 2).alias("approx_p95"),
        F.element_at("_ep", 1).alias("exact_p50"),
        F.element_at("_ep", 2).alias("exact_p95"),
        "n",
    )


# --------------------------------------------------------------------
# Spark 4 SQL pipe syntax (|>) + named-parameter binding: the
# linear-dataflow SQL dialect (each |> stage consumes the previous
# result — SELECT/WHERE/AGGREGATE read top-to-bottom like a DataFrame
# chain) with the threshold passed via spark.sql(..., args={...})
# instead of string interpolation. Same Catalyst plan as the
# classic-SQL oracle — the dialect is parse-level sugar, so every
# optimization (pushdown, partial agg) is identical.
# --------------------------------------------------------------------
@query(
    "star_pipe_syntax_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def star_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["lineitem"])
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= :min_qty
        |> SELECT l_returnflag,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_e4
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     SUM(rev_e4) / CAST(10000 AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        """,
        args={"min_qty": 30},
    ).select("l_returnflag", "n_items", "revenue")


# --------------------------------------------------------------------
# pandas API on Spark (pyspark.pandas): the pandas-dialect front end
# over the same engine — groupby/agg written as pandas compiles to
# the identical Catalyst plan (distributed, no driver collect), shown
# by pairing it with the plain-SQL oracle. Exact integer outputs so
# the hash check is strict. The migration path for pandas codebases
# that outgrew one machine.
# --------------------------------------------------------------------
@query(
    "star_pandas_api_stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def star_pandas_api_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        psdf = ps.read_parquet(os.path.join(sf_dir, "orders.parquet"))
        psdf = psdf.assign(
            # nullable Int64: a NULL price stays NULL (plain int64
            # astype refuses missing values); sum() skips it like SQL
            cents=(psdf["o_totalprice"] * 100).round().astype("Int64")
        )
        g = (
            # dropna=False: SQL GROUP BY keeps the NULL-key group
            psdf.groupby("o_orderstatus", dropna=False)
            .agg(
                n_orders=("o_orderkey", "count"),
                total_cents=("cents", "sum"),
                n_customers=("o_custkey", "nunique"),
            )
            .reset_index()
        )
        return g.to_spark().select(
            "o_orderstatus",
            F.col("n_orders").cast("long"),
            F.col("total_cents").cast("long"),
            F.col("n_customers").cast("long"),
        )


# --------------------------------------------------------------------
# Time-series densification: generate the full day spine per series,
# left-join the sparse daily aggregate onto it, zero-fill counts and
# forward-fill the last observed value — the gap-filling operation
# every dashboard/feature pipeline needs when days with no events
# must still exist as rows. Spine = sequence() + explode (pure
# expression, no driver loop); forward fill = last(ignorenulls) over
# an unbounded-preceding row frame.
# Scale: the spine is |series| × |days| rows — tiny next to the fact
# table; the join is broadcast (spine side); one window per series.
# --------------------------------------------------------------------
@query(
    "star_densify_daily",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
        FROM events
    ),
    spine AS (
        SELECT et.event_type, d.day
        FROM (SELECT DISTINCT event_type FROM events) et
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
                AS day
            FROM bounds
        ) d
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT s.event_type, s.day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
           CAST(last_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_ffill
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def star_densify_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    ev = load(spark, sf_dir, "events")
    # Round-13: ONE events pass (was three — round-13 scan sweep).
    # Both spine inputs distribute over the per-(type, day) aggregate:
    # min/max(to_date(ts)) == min/max over the group keys (min/max
    # ignore NULL days on both paths), and the distinct event_type set
    # == the aggregate's key set (every event lands in some group,
    # NULL types included). The staged daily frame is O(types x days).
    daily = stage_boundary(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            ),
        ),
        materialize=False,
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.last("cents", ignorenulls=True).over(w).cast("long").alias(
                "cents_ffill"
            ),
        )
    )


# --------------------------------------------------------------------
# Pivot with MULTIPLE aggregates per pivoted value (count + exact
# cents sum per status): Spark names the output columns
# "<value>_<aggAlias>", so both measures ride one pivot pass — one
# shuffle, 2×|values| output columns. star_pivot_status covers the
# single-agg form.
# --------------------------------------------------------------------
@query(
    "star_pivot_multi_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
               AS BIGINT) AS o_n,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
               THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0)
               AS BIGINT) AS o_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS f_n,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0)
               AS BIGINT) AS f_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def star_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("cents"),
        )
        .na.fill(0)
    )
    return piv.select(
        "o_orderpriority",
        F.col("O_n").alias("o_n"),
        F.col("O_cents").alias("o_cents"),
        F.col("F_n").alias("f_n"),
        F.col("F_cents").alias("f_cents"),
    )


# --------------------------------------------------------------------
# Data-quality constraint audit (expectations-style): null rates,
# key uniqueness, domain membership, and referential integrity in ONE
# pass per table + one anti-join for the FK check — the checks a
# 100 TB ingest runs before promoting a batch. Everything is exact
# counts, so the audit is oracle-checkable down to the last row.
# --------------------------------------------------------------------
@query(
    "star_dq_audit",
    oracle="""
    SELECT
        (SELECT COUNT(*) FROM orders) AS n_orders,
        (SELECT COUNT(*) - COUNT(o_custkey) FROM orders)
            AS null_custkey,
        (SELECT COUNT(*) FROM
            (SELECT o_orderkey FROM orders
             GROUP BY o_orderkey HAVING COUNT(*) > 1) d)
            AS dup_orderkeys,
        (SELECT COUNT(*) FROM orders
         WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
            AS bad_status,
        (SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
            AS orphan_lineitems
    """,
)
def star_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    # Round-13: ONE orders pass (was three — round-13 scan sweep).
    # Every audit statistic distributes over a per-orderkey aggregate:
    # n_orders = Σc, null_custkey = Σc - Σcount(o_custkey),
    # bad_status = Σ per-key count-ifs, dup keys filter c > 1, and the
    # orphan anti-join matches the DISTINCT key set (dedup never
    # changes an anti-join). The per-key frame is staged (O(orderkeys))
    # and feeds all three branches. COALESCE(...,0) keeps the
    # empty-corpus semantics the round-10 fuzz pinned: SUM over an
    # empty frame is NULL where the old COUNT forms gave 0.
    per_key = stage_boundary(
        load(spark, sf_dir, "orders")
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count("o_custkey").alias("nck"),
            F.count(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            ).alias("bad"),
        ),
        materialize=False,
    )
    base = per_key.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.sum("c") - F.sum("nck"), F.lit(0)).alias(
            "null_custkey"
        ),
        F.coalesce(F.sum("bad"), F.lit(0)).alias("bad_status"),
    )
    dups = (
        per_key.filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_orderkeys"))
    )
    orphans = (
        li.join(
            # shuffle_hash hint: the per-orderkey aggregate SCALES with
            # orders, but its post-aggregate size estimate is small
            # enough that the static planner broadcast it at sf1 (the
            # round-13 broadcast audit caught exactly this on the
            # per_key restructure — the eager-build OOM class). A
            # hinted shuffle stays AQE-upgradable from runtime stats.
            per_key.select("o_orderkey").hint("shuffle_hash"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    return (
        base.crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(orphans))
        .select(
            "n_orders", "null_custkey", "dup_orderkeys", "bad_status",
            "orphan_lineitems",
        )
    )


# --------------------------------------------------------------------
# Cohort retention: group users by first-activity week (the cohort),
# then count how many are still active N weeks later — the classic
# product-analytics triangle. Weeks are epoch-day div 7 — exact
# integers, no date-truncation ambiguity between engines.
#
# Round-12 rewrite (self-join sweep catch #3): the per-user cohort
# used to be a groupBy(user).min(week) frame JOINED BACK onto the
# activity stream — two events scans, a shuffle-hinted O(users) join,
# three exchanges. A per-key aggregate consumed alongside the rows
# that produced it is an unbounded-frame WINDOW:
# min(week) over (partition by user_id) — one events scan, one
# user-keyed shuffle, no join frame for any planner to mis-size.
# NULL users filtered up front (the old join's equality dropped them
# implicitly); NULL weeks ignored by min() identically in both
# shapes. The retention triangle agg is unchanged.
# --------------------------------------------------------------------
@query(
    "star_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) // 7 AS week
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(week) AS cohort_week FROM activity
        GROUP BY user_id
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    WHERE a.week - c.cohort_week <= 8
    GROUP BY c.cohort_week, week_offset
    """,
)
def star_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    activity = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
            .cast("long")
            .alias("week"),
        )
        .filter(F.col("user_id").isNotNull())
    )
    w = Window.partitionBy("user_id")
    return (
        activity.withColumn("cohort_week", F.min("week").over(w))
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .filter(F.col("week_offset") <= 8)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# --------------------------------------------------------------------
# Marketing-style conversion attribution: for each purchase, credit
# the FIRST and LAST click the same user made in the preceding 24h —
# first-touch and last-touch in one pass. Tie-break on click event_id
# via the (ts, id) struct so simultaneous clicks attribute identically
# in both engines.
#
# Round-12 rewrite (the self-join sweep's second catch): the
# (purchase x click) interval self-join — two event shuffles plus an
# SMJ whose range residual enumerates every pair — is a RANGE-FRAME
# WINDOW in disguise: partition by user, order by ts, frame
# [ts - 24h + 1us, ts], and the three aggregates (count / min / max
# of a clicks-only CASE) read each purchase's candidate clicks
# without ever materializing pairs. ONE shuffle + one sort replaces
# two shuffles + a pair-enumerating join (the union-plus-window
# pattern SCALE.md already prescribes for as-of joins). Boundary
# exactness: the frame's inclusive lower bound sits 1 microsecond
# above pts - 24h, equal to the join's STRICT cts > pts - 24h at the
# data's microsecond granularity; interval arithmetic on
# TIMESTAMP_NTZ is naive on both engines, so no session-timezone/DST
# hazard. NULL user_id/ts filtered up front (the old inner join's
# equality dropped them implicitly).
# --------------------------------------------------------------------
_TOUCH_FRAME = (
    "OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN "
    "INTERVAL '23:59:59.999999' HOUR TO SECOND PRECEDING AND "
    "CURRENT ROW)"
)
_TOUCH_CLICK_KEY = (
    "CASE WHEN event_type = 'click' THEN struct(ts, event_id) END"
)



@query(
    "star_touch_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(MIN(struct_pack(ts := c.ts, id := c.event_id)).id
               AS BIGINT) AS first_touch_click,
           CAST(MAX(struct_pack(ts := c.ts, id := c.event_id)).id
               AS BIGINT) AS last_touch_click,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_clicks
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 24 HOUR
    GROUP BY p.event_id
    """,
)
def star_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(
            F.col("event_type").isin("purchase", "click")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
    )
    # three aggregates in ONE select -> a single Window node (chained
    # withColumn plants one Window each and CollapseWindow doesn't
    # merge through the interleaved Projects)
    out = ev.select(
        "*",
        F.expr(f"count({_TOUCH_CLICK_KEY}) {_TOUCH_FRAME}").alias(
            "n_cand"
        ),
        F.expr(f"min({_TOUCH_CLICK_KEY}) {_TOUCH_FRAME}").alias(
            "first_k"
        ),
        F.expr(f"max({_TOUCH_CLICK_KEY}) {_TOUCH_FRAME}").alias("last_k"),
    ).filter((F.col("event_type") == "purchase") & (F.col("n_cand") > 0))
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("first_k.event_id").cast("long").alias("first_touch_click"),
        F.col("last_k.event_id").cast("long").alias("last_touch_click"),
        F.col("n_cand").cast("long").alias("n_candidate_clicks"),
    )


# --------------------------------------------------------------------
# Conversion-latency distribution: exact percentiles of the
# click->purchase delay over last-touch attributed pairs. Delays are
# integer MICROSECONDS (epoch_us subtraction — the floor-vs-round
# timestamp hazard doesn't exist for exact integer epochs), and
# Spark's exact percentile() == DuckDB quantile_cont on identical
# integer multisets.
# --------------------------------------------------------------------
@query(
    "star_conversion_latency",
    oracle="""
    WITH pairs AS (
        SELECT p.event_id,
               MAX(struct_pack(ts := c.ts, id := c.event_id)).ts AS last_ts,
               ANY_VALUE(p.ts) AS pts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 24 HOUR
        GROUP BY p.event_id
    ),
    delays AS (
        SELECT CAST(epoch_us(pts) - epoch_us(last_ts) AS BIGINT) AS delay_us
        FROM pairs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           quantile_cont(delay_us, 0.5) AS p50_us,
           quantile_cont(delay_us, 0.9) AS p90_us,
           CAST(MAX(delay_us) AS BIGINT) AS max_us
    FROM delays
    """,
)
def star_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 rewrite, same range-frame window as
    # star_touch_attribution (which documents the boundary/NULL
    # reasoning): last-touch is max(struct(ts, id)) over the 24h-1us
    # preceding frame — one shuffle + sort, no (purchase x click)
    # pair join. A purchase with no candidate click has a NULL last_k
    # and drops, matching the old inner join.
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(
            F.col("event_type").isin("purchase", "click")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
    )
    pairs = (
        ev.withColumn(
            "last_k", F.expr(f"max({_TOUCH_CLICK_KEY}) {_TOUCH_FRAME}")
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_k").isNotNull()
        )
    )
    delays = pairs.select(
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("last_k.ts").cast("timestamp"))
        ).alias("delay_us")
    )
    return delays.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.expr("percentile(delay_us, 0.5)").alias("p50_us"),
        F.expr("percentile(delay_us, 0.9)").alias("p90_us"),
        F.max("delay_us").alias("max_us"),
    )


# --------------------------------------------------------------------
# EXACT distinct counting via mergeable bitmaps (Spark 4 bitmap_*
# aggregates): each 32k-wide bucket of the key space becomes one
# bitmap; bitmaps OR together across partitions/slices (map-side
# combinable, like the count-min grid but EXACT), and the distinct
# count is the sum of bit counts. The scalable exact alternative
# when approx_count_distinct's error is unacceptable and
# COUNT(DISTINCT)'s expand/double-shuffle is too slow — and the
# per-bucket bitmaps persist as an incremental-maintenance state.
# Oracle = plain COUNT(DISTINCT): the bitmap path must agree bit-for-
# bit because it IS exact.
# --------------------------------------------------------------------
@query(
    "star_bitmap_distinct",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def star_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    )
    per_bucket = (
        joined.groupBy(
            "c_mktsegment",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(o_custkey))"
            ).alias("bm")
        )
    )
    return per_bucket.groupBy("c_mktsegment").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_cust")
    )


# --------------------------------------------------------------------
# Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP,
# Spark 4): deterministic because the within-group ORDER BY totally
# orders the distinct elements; DuckDB's string_agg takes the same
# ORDER BY. The "summarize group members into a row" reporting op.
# --------------------------------------------------------------------
@query(
    "star_listagg_statuses",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def star_listagg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------
# HLL sketches as DATA (Spark 4 Apache DataSketches integration):
# unlike approx_count_distinct (estimate-only), hll_sketch_agg emits
# the sketch BYTES — per-slice sketches persist, union incrementally
# across days/partitions (hll_union_agg), and estimate on demand.
# The mergeable-summaries pattern for approximate distinct at 100 TB
# (exact twin: star_bitmap_distinct). rows-only: DuckDB has no
# DataSketches HLL twin; pytest pins the error bound vs exact.
# --------------------------------------------------------------------
@query("star_hll_sketch_union")
def star_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["orders"])
    # per-status sketches (the persistable per-slice state), unioned
    # to a grand estimate — one pass, map-side-combinable
    return spark.sql(
        """
        SELECT CAST(hll_sketch_estimate(hll_union_agg(s)) AS BIGINT)
                   AS est_distinct_cust,
               CAST(COUNT(*) AS BIGINT) AS n_slices
        FROM (SELECT o_orderstatus,
                     hll_sketch_agg(o_custkey) AS s
              FROM orders GROUP BY o_orderstatus)
        """
    )


# --------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy walk. The part
# key space forms an implicit quad-tree (parent = key div 4); each
# part walks its ancestor chain to the root and reports the depth —
# the org-chart/BOM traversal pattern SQL engines historically
# couldn't express without driver-side loops. Iterations are
# Catalyst-planned unions (depth ~log4(|part|)); DuckDB runs the
# identical recursion, so the result is hash-exact.
# --------------------------------------------------------------------
@query(
    "star_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
        FROM part
        UNION ALL
        SELECT part, node // 4 AS node, depth + 1
        FROM anc WHERE node > 0
    )
    SELECT CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           CAST(COUNT(DISTINCT part) AS BIGINT) AS n_parts
    FROM (SELECT part, MAX(depth) AS depth FROM anc GROUP BY part) d
    GROUP BY d.depth
    """,
)
def star_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["part"])
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
            FROM part
            UNION ALL
            SELECT part, node div 4 AS node, depth + 1
            FROM anc WHERE node > 0
        )
        SELECT CAST(MAX(depth) AS BIGINT) AS depth_to_root,
               CAST(COUNT(DISTINCT part) AS BIGINT) AS n_parts
        FROM (SELECT part, MAX(depth) AS depth FROM anc GROUP BY part) d
        GROUP BY d.depth
        """
    )


# --------------------------------------------------------------------
# Rolling 7-day distinct users (WAU): distinct-count over a SLIDING
# window can't ride an ordinary window frame (distinct isn't
# decomposable), so each event is exploded into the 7 report days it
# is visible to — a bounded ×(window/slide) expansion — followed by a
# plain per-day distinct aggregation. The standard scale trade:
# 7× more rows through one exchange beats 7 separate scans, and the
# sketch/bitmap variants (star_hll_sketch_union / bitmap_distinct)
# drop the expansion entirely when approximate/mergeable is enough.
# Epoch-day integers keep the window arithmetic engine-exact.
# --------------------------------------------------------------------
@query(
    "star_weekly_active_users",
    oracle="""
    WITH visible AS (
        SELECT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) + offs.o AS report_day
        FROM events
        CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS o) offs
    )
    SELECT report_day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM visible
    GROUP BY report_day
    """,
)
def star_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE '1970-01-01')")
        .cast("long")
        .alias("day"),
    )
    return (
        ev.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias(
                "report_day"
            ),
        )
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


# --------------------------------------------------------------------
# Robust statistics: median absolute deviation per group — two exact
# percentile passes (median of |x - median|). Both engines compute
# exact interpolated percentiles over identical integer-cent
# multisets, so even the interpolated halves agree bitwise. The
# outlier-resistant spread measure for skewed money distributions.
# --------------------------------------------------------------------
@query(
    "star_mad_robust_stats",
    oracle="""
    WITH med AS (
        SELECT o_orderstatus, quantile_cont(
                   CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5) AS m
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           ANY_VALUE(m) / 100.0 AS median_price,
           quantile_cont(
               abs(CAST(ROUND(o_totalprice * 100) AS BIGINT) - m), 0.5)
               / 100.0 AS mad_price
    FROM orders o JOIN med USING (o_orderstatus)
    GROUP BY o.o_orderstatus
    """,
)
def star_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderstatus", _cents("o_totalprice").alias("cents")
    )
    # Round 14 (§2.4): the median aggregate and the deviation
    # join-back each scanned orders — staging the shared 2-column
    # (status, cents) projection makes it one corpus pass.
    from ..operators.staging import ab_off, stage_boundary

    if not ab_off("mad_stage"):
        orders = stage_boundary(orders, materialize=False)
    med = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(cents, 0.5)").alias("m")
    )
    return (
        orders.join(F.broadcast(med), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            (F.first("m") / 100.0).alias("median_price"),
            (
                F.expr("percentile(abs(cents - m), 0.5)") / 100.0
            ).alias("mad_price"),
        )
    )


# --------------------------------------------------------------------
# Grouped OLS trend: per-priority revenue-over-time slope from the
# closed form (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). The SUMS are exact
# int64 (epoch days × cents); the n·Σ COMBINATION is done in DOUBLE
# on both sides — n·Σxy alone tops int64 beyond ~100k rows/group,
# and identical int64 sums convert to identical doubles, so the
# combination stays bit-identical cross-engine while never
# overflowing. One groupBy, no ML library.
# --------------------------------------------------------------------
@query(
    "star_grouped_ols_trend",
    oracle="""
    WITH pts AS (
        SELECT o_orderpriority,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
               / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
               AS slope_cents_per_day
    FROM pts GROUP BY o_orderpriority
    """,
)
def star_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("datediff(to_date(o_orderdate), DATE '1995-01-01')")
        .cast("long")
        .alias("x"),
        _cents("o_totalprice").alias("y"),
    )
    n_d = F.count(F.lit(1)).cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    return pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        # try_divide: a group whose orders all share one date has no
        # x-variance — the slope is NULL on both engines
        F.try_divide(n_d * sxy - sx * sy, n_d * sxx - sx * sx).alias(
            "slope_cents_per_day"
        ),
    )


# --------------------------------------------------------------------
# Top-k WITH TIES (rank() <= k): unlike row_number top-k
# (star_topk_per_segment), ties at the boundary are all kept — the
# correct semantics when "top 3 prices" must not arbitrarily drop a
# tied order. Result size is data-dependent; rank still pushes down
# (WindowGroupLimit handles rank() like row_number).
# --------------------------------------------------------------------
@query(
    "star_topk_with_ties",
    oracle="""
    SELECT o_orderpriority, price_c, rnk
    FROM (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY ROUND(o_totalprice * 100) DESC)
                   AS rnk
        FROM orders
    ) r WHERE rnk <= 3
    """,
)
def star_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("price_c").desc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", _cents("o_totalprice").alias("price_c"))
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------
# Co-occurrence (market-basket) analysis: which event types happen
# together in the same user-day "basket". Self-join on the basket key
# with a < b ordering — the pair space is bounded by (types per
# basket)², not corpus², and the distinct-first projection keeps the
# join input minimal.
# --------------------------------------------------------------------
@query(
    "star_cooccurrence_baskets",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_baskets
    FROM basket a JOIN basket b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def star_cooccurrence_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 rewrite (the star_sequential_pattern pattern): a basket
    # holds at most |event-type enum| distinct types, so the pair
    # space is a bounded per-basket ARRAY — collect_set per
    # (user, day) and explode twice within the row. This replaces the
    # old distinct() + merge-hinted self-join (two shuffles of a
    # (users x days)-scale frame plus an SMJ) with ONE events scan
    # and ONE basket-keyed shuffle; identical output measured 1.3x
    # faster at sf0.1 and there is no join left to mis-plan at 100 TB.
    # Null semantics pinned to the oracle's join equality: NULL
    # user_id / day groups never pair there (= is never true on
    # NULL), so they are filtered before grouping here; NULL
    # event_type is dropped by collect_set, matching the join's
    # never-true a < b comparison.
    baskets = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.collect_set("event_type").alias("types"))
    )
    return (
        baskets.select(F.explode("types").alias("type_a"), F.col("types"))
        .select("type_a", F.explode("types").alias("type_b"))
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


# --------------------------------------------------------------------
# Percent-of-total via window aggregate: each nation's share of its
# region's revenue WITHOUT a second group-by-and-join — the window
# sum rides the same shuffle as the group-by. Numerator and
# denominator stay exact int64 until one final division, so the
# shares are bit-identical cross-engine.
# --------------------------------------------------------------------
@query(
    "star_share_of_region",
    oracle="""
    WITH nat AS (
        SELECT r_name, n_name,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS rev_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, rev_c,
           rev_c * 1.0 / SUM(rev_c) OVER (PARTITION BY r_name)
               AS share_of_region
    FROM nat
    """,
)
def star_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum("cents").alias("rev_c"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        "rev_c",
        (F.col("rev_c") * 1.0 / F.sum("rev_c").over(w)).alias(
            "share_of_region"
        ),
    )


# --------------------------------------------------------------------
# Conditional carry-forward: microseconds since each user's LAST
# error event — last_value(CASE WHEN error THEN ts END) IGNORE NULLS
# over the ordered history. The "time since last incident" feature
# every monitoring pipeline computes; NULL until the first error, by
# construction in both engines.
# --------------------------------------------------------------------
@query(
    "star_time_since_last_error",
    oracle="""
    SELECT event_id,
           CAST(epoch_us(ts) - last_value(
                   CASE WHEN event_type = 'error' THEN epoch_us(ts) END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS us_since_error
    FROM events
    WHERE user_id % 17 = 0
    """,
)
def star_time_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 17 == 0)
    err_us = F.when(
        F.col("event_type") == "error",
        F.unix_micros(F.col("ts").cast("timestamp")),
    )
    return ev.select(
        "event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.last(err_us, ignorenulls=True).over(w)
        ).alias("us_since_error"),
    )


# --------------------------------------------------------------------
# Session path analysis: the most common opening event sequences.
# Ordered collect within (user, day) sessions — determinism comes
# from sorting an array of (ts, event_id, type) structs rather than
# trusting collect_list's arrival order (which is partition-
# dependent); the path is the first 3 steps joined to a string.
# Sequence mining's entry point, all within native array functions.
# --------------------------------------------------------------------
@query(
    "star_session_paths",
    oracle="""
    WITH steps AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:3], '>')
                   AS path3
        FROM events GROUP BY user_id, day
    )
    SELECT path3, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM steps GROUP BY path3
    HAVING COUNT(*) >= 5
    """,
)
def star_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.struct("ts", "event_id", "event_type").alias("step"),
    )
    steps = (
        ev.groupBy("user_id", "day")
        .agg(F.sort_array(F.collect_list("step")).alias("steps"))
        .select(
            F.array_join(
                F.slice(F.col("steps.event_type"), 1, 3), ">"
            ).alias("path3")
        )
    )
    return (
        steps.groupBy("path3")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )




# --------------------------------------------------------------------
# Contingency table (df.stat.crosstab): event type × day-of-week
# counts as a wide table — the DataFrame stat API's face of the CASE
# pivot, oracle-matched against the explicit conditional-sum form.
# Columns are the 7 ISO day numbers (Sunday=1, Spark dayofweek ==
# DuckDB dayofweek(ts)+1 offset handled below).
# --------------------------------------------------------------------
@query(
    "star_crosstab_dow",
    oracle="""
    SELECT event_type AS event_type_dow,
           CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS "1",
           CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS "2",
           CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS "3",
           CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS "4",
           CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS "5",
           CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS "6",
           CAST(SUM(CASE WHEN dow = 7 THEN 1 ELSE 0 END) AS BIGINT) AS "7"
    FROM (SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS dow
          FROM events)
    GROUP BY event_type
    """,
)
def star_crosstab_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    ct = df.stat.crosstab("event_type", "dow")
    # crosstab's output schema is DATA-DEPENDENT (one column per
    # observed dow value) — a day-of-week absent from the input (or a
    # zero-row day) would otherwise make the fixed 7-column contract
    # fail to resolve; absent days are an explicit zero
    present = set(ct.columns)
    return ct.select(
        "event_type_dow",
        *[
            (
                F.col(f"`{d}`").cast("long")
                if str(d) in present
                else F.lit(0).cast("long")
            ).alias(str(d))
            for d in range(1, 8)
        ],
    )


# --------------------------------------------------------------------
# Seeded stratified sampling (df.stat.sampleBy): per-stratum Bernoulli
# fractions with a fixed seed — MLlib-style randomized sampling next
# to the deterministic hash-threshold twin (datapipe_stratified_
# sample). Seeded-but-engine-private randomness -> rows-only; the
# pytest pins per-stratum fraction accuracy.
# --------------------------------------------------------------------
@query("star_sample_by_strata")
def star_sample_by_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    fractions = {"click": 0.5, "view": 0.25, "purchase": 1.0,
                 "signup": 1.0, "error": 1.0}
    sampled = ev.stat.sampleBy("event_type", fractions, seed=42)
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


# --------------------------------------------------------------------
# Correlated LATERAL join (SQL:2016 LATERAL, Spark 3.2+/DuckDB): the
# "top-N related rows per outer row" idiom in its declarative form.
# Catalyst decorrelates the limit-2 subquery (DomainJoin rewrite)
# instead of nested-looping the customer scan per nation; the
# DataFrame twin of the same shape is star_topk_per_segment's
# rank-pushdown window. One shared SQL string serves both engines.
# --------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
"""


@query("star_lateral_topn", oracle=_LATERAL_SQL)
def star_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir, tables=["nation", "customer"])
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------
# SCD2 dimension build (slowly-changing dimension, type 2): collapse
# each user's event stream into validity intervals — one row per run
# of consecutive identical event_type, with [valid_from, valid_to)
# and an is_current flag on the open interval. The standard
# warehouse pattern for versioning a dimension from a CDC/event feed
# (gaps-and-islands via lag + conditional running sum).
#
# Scale design: every window is partitioned by user_id — the sort is
# per-user, the shuffle is one hash exchange on user_id reused by
# both window passes and the final group-by (same key, Catalyst
# plans ONE Exchange). Nothing global; skew = one hot user, handled
# by AQE. [beyond-reference]
# --------------------------------------------------------------------
_SCD2_SQL = """
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS run_id
        FROM flagged
    ),
    versions AS (
        SELECT user_id, CAST(run_id AS BIGINT) AS version,
               event_type, MIN(ts) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM runs
        GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, version, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
           CASE WHEN LEAD(valid_from) OVER (
                    PARTITION BY user_id ORDER BY version)
                IS NULL THEN 1 ELSE 0 END AS is_current,
           n_events
    FROM versions
"""


@query("star_scd2_history", oracle=_SCD2_SQL)
def star_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg")
    )
    runs = events.select(
        "user_id", "event_type", "ts", "event_id", chg
    ).withColumn("run_id", F.sum("chg").over(w))
    versions = runs.groupBy(
        "user_id", F.col("run_id").cast("long").alias("version"), "event_type"
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return versions.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------------------
# Point-in-time (PIT) join against the SCD2 dimension: each probe
# (user, probe_ts) picks the version whose half-open validity
# interval contains it — the feature-store join that keeps training
# data leakage-free (features as-of label time, never later). Probes
# are the events themselves shifted +12h, so some land in their own
# version and some in the next: both directions of the interval
# predicate are exercised.
#
# Scale design: equi-join on user_id carries the interval predicate
# as a post-join filter — per-user version lists are short (bounded
# by that user's change count), so the range check is cheap inside
# each matched pair; no interval explosion, no cartesian product.
# Same shape as star_range_join but against a DERIVED versioned dim.
# --------------------------------------------------------------------
_PIT_SQL = f"""
    WITH versions AS ({_SCD2_SQL}),
    probes AS (
        SELECT event_id, user_id, ts + INTERVAL 12 HOUR AS probe_ts
        FROM events WHERE event_id < 400
    )
    SELECT p.event_id, p.user_id, p.probe_ts,
           v.version, v.event_type AS version_type
    FROM probes p JOIN versions v
      ON p.user_id = v.user_id
     AND p.probe_ts >= v.valid_from
     AND (v.valid_to IS NULL OR p.probe_ts < v.valid_to)
"""


@query("star_scd2_pit_join", oracle=_PIT_SQL)
def star_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    versions = star_scd2_history(spark, sf_dir).select(
        "user_id",
        "version",
        F.col("event_type").alias("version_type"),
        "valid_from",
        "valid_to",
    )
    probes = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 400)
        .select(
            "event_id",
            "user_id",
            (F.col("ts") + F.expr("INTERVAL 12 HOUR")).alias("probe_ts"),
        )
    )
    return probes.join(
        versions,
        on=[
            probes["user_id"] == versions["user_id"],
            probes["probe_ts"] >= versions["valid_from"],
            versions["valid_to"].isNull()
            | (probes["probe_ts"] < versions["valid_to"]),
        ],
    ).select(
        "event_id",
        probes["user_id"].alias("user_id"),
        "probe_ts",
        "version",
        "version_type",
    )


# --------------------------------------------------------------------
# Join-key skew profile: the diagnostic run BEFORE committing to a
# join strategy — per-key frequency of the prospective join key, its
# share of the table, and the key-vs-mean hot ratio. The output is
# what decides between plain shuffle join, AQE skew split, and
# manual salting (operators/skew.py). One group-by + a 2-row-ish
# broadcast of the grand totals; top-k via rank pushdown, no global
# sort.
# --------------------------------------------------------------------
@query(
    "star_skew_profile",
    oracle="""
    WITH per_key AS (
        SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT SUM(n) AS total_rows, COUNT(*) AS n_keys FROM per_key
    )
    SELECT key, n,
           ROUND(n * 1.0 / total_rows, 6) AS share,
           -- n * 1.0 FIRST so the n x n_keys product runs in double:
           -- the BIGINT product wraps once rows x keys passes 2^63
           -- (identical double on both engines)
           ROUND(n * 1.0 * n_keys / total_rows, 6) AS hot_ratio
    FROM per_key, tot
    ORDER BY n DESC, key
    LIMIT 15
    """,
)
def star_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per_key.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )  # 1-row, broadcast
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") * 1.0 / F.col("total_rows"), 6).alias("share"),
            # n * 1.0 FIRST: the long n x n_keys product wraps once
            # rows x keys passes 2^63 (same op order as the oracle)
            F.round(
                F.col("n") * 1.0 * F.col("n_keys") / F.col("total_rows"), 6
            ).alias("hot_ratio"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(15)
    )


# --------------------------------------------------------------------
# SQL:2023 aggregate surface [beyond-reference]: count_if, bool_and
# (EVERY), bool_or (ANY), and exact interpolated median — one hash
# aggregate over orders, all map-side-combinable except median (which
# Spark evaluates as exact percentile; the mergeable scale twin is
# star_approx_percentiles). Median runs on exact integer cents so the
# interpolation midpoint is bit-reproducible cross-engine.
# --------------------------------------------------------------------
@query(
    "star_modern_aggregates",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_high,
           CAST(bool_and(o_totalprice > 0) AS INTEGER) AS all_pos,
           CAST(bool_or(o_totalprice > 400000) AS INTEGER) AS any_giant,
           ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
                               0.5) / 100.0, 3) AS median_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def star_modern_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("o_totalprice") > 200000)
            .cast("long")
            .alias("n_high"),
            F.bool_and(F.col("o_totalprice") > 0)
            .cast("int")
            .alias("all_pos"),
            F.bool_or(F.col("o_totalprice") > 400000)
            .cast("int")
            .alias("any_giant"),
            F.round(
                F.percentile(_cents("o_totalprice"), F.lit(0.5)) / 100.0, 3
            ).alias("median_price"),
        )
    )


# --------------------------------------------------------------------
# Null-safe equality join [beyond-reference]: Spark's <=> operator
# (ANSI IS NOT DISTINCT FROM) treats NULL = NULL as a match — the
# semantics MERGE pipelines need when the join key itself is nullable.
# The fixtures carry no null keys, so both sides NULLIF a known value
# to manufacture them deterministically. Catalyst plans <=> as a
# regular hash join (EqualNullSafe key), so the null bucket lands in
# ONE partition — at 100 TB a heavily-null key needs the salted-join
# treatment (operators/skew.py); here the dimension side is broadcast
# so no shuffle occurs at all.
# --------------------------------------------------------------------
@query(
    "star_null_safe_join",
    oracle="""
    WITH o AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio_key,
                      o_totalprice
               FROM orders),
    d AS (SELECT NULLIF(p, '1-URGENT') AS prio_key,
                 substring(p, 1, 1) AS prio_rank
          FROM (SELECT DISTINCT o_orderpriority AS p FROM orders))
    SELECT COALESCE(d.prio_rank, '?') AS prio_rank,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM o JOIN d ON o.prio_key IS NOT DISTINCT FROM d.prio_key
    GROUP BY prio_rank
    """,
)
def star_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
            "prio_key"
        ),
        "o_totalprice",
    )
    d = (
        orders.select(F.col("o_orderpriority").alias("p"))
        .distinct()
        .select(
            F.nullif(F.col("p"), F.lit("1-URGENT")).alias("prio_key"),
            F.substring("p", 1, 1).alias("prio_rank"),
        )
    )
    return (
        o.join(F.broadcast(d), o["prio_key"].eqNullSafe(d["prio_key"]))
        .groupBy(F.coalesce(d["prio_rank"], F.lit("?")).alias("prio_rank"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------
# Regex pattern matching over ordered event sequences — the
# MATCH_RECOGNIZE idea (SQL:2016 row-pattern recognition) expressed
# Spark-native. [beyond-reference] Each (user, day) session becomes a
# one-char-per-event string in event-time order (the five fixture
# event types have distinct initials); a session "matches" when a
# click is immediately followed by an error with a purchase anywhere
# later — exactly the kind of behavioral pattern CEP engines chase.
#
# Scale shape: one hash exchange on (user_id, day); the sequence
# string is built by sorting the COLLECTED (ts, event_id, type)
# structs — never trusting collect_list arrival order, which is
# partition-dependent — and session strings are bounded by session
# length, not corpus size. The regex runs once per session, JVM-side.
# --------------------------------------------------------------------
@query(
    "star_event_pattern_match",
    oracle="""
    WITH seqs AS (
        SELECT CAST(ts AS DATE) AS day,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'ce.*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
    FROM seqs GROUP BY day
    """,
)
def star_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.struct("ts", "event_id", "event_type").alias("step"),
    )
    seqs = (
        ev.groupBy("user_id", "day")
        .agg(F.sort_array(F.collect_list("step")).alias("steps"))
        .select(
            "day",
            F.array_join(
                F.transform(
                    F.col("steps.event_type"),
                    lambda t: F.substring(t, 1, 1),
                ),
                "",
            ).alias("seq"),
        )
    )
    return seqs.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("seq").rlike("ce.*p"), 1).otherwise(0)
        ).alias("n_matched"),
    )


# --------------------------------------------------------------------
# Benford first-significant-digit audit — the classic fraud/anomaly
# screen for monetary columns [beyond-reference; complements
# star_dq_audit]. Digit extraction goes through INTEGER-to-string
# (engine-stable), never float log10; the Benford expectations
# log10(1 + 1/d) are shared 17-digit literals on both sides because
# libm log10 is not guaranteed bit-identical across JVM and DuckDB.
# Scale shape: one map-side-combinable 9-group aggregate + a
# broadcast 1-row total; chi-square contribution per digit in fixed
# float op order. chi2_term is UNROUNDED (round-13 rounding-contract
# extension, same class as the CUPED catch): its numerator is a
# squared deviation so the term's magnitude grows linearly with SF
# and can outgrow 6-decimal precision (sub-ULP past ~9e9, reachable
# at sf >= ~1e4 corpus counts), while the expression itself — BIGINT
# n/total and a shared 17-digit p literal through identical IEEE op
# order on both sides — is already bit-exact without rounding.
# p_obs/p_benford stay rounded: both are bounded ratios <= 1.
# --------------------------------------------------------------------
import math as _math

_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@query(
    "star_benford_audit",
    oracle=f"""
    WITH digits AS (
        SELECT substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT digit, n,
           ROUND(n * 1.0 / total, 6) AS p_obs,
           ROUND({_BENFORD_SQL_CASE}, 6) AS p_benford,
           (n - total * ({_BENFORD_SQL_CASE}))
                 * (n - total * ({_BENFORD_SQL_CASE}))
                 / (total * ({_BENFORD_SQL_CASE})) AS chi2_term
    FROM counts, tot
    """,
)
def star_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("total"))  # 1-row, broadcast
    p_ben = F.element_at(
        F.create_map(
            *[
                x
                for d, p in _BENFORD_P.items()
                for x in (F.lit(str(d)), F.lit(p))
            ]
        ),
        F.col("digit"),
    )
    dev = F.col("n") - F.col("total") * p_ben
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("p_obs"),
        F.round(p_ben, 6).alias("p_benford"),
        (dev * dev / (F.col("total") * p_ben)).alias("chi2_term"),
    )


# --------------------------------------------------------------------
# Winsorization (percentile clipping) — the robust-stats preprocessing
# step for outlier-heavy monetary columns: clip each group's values to
# its own [p05, p95] band, then report the winsorized mean alongside
# exact clip counts. Two aggregations: the bounds table is one tiny
# row-per-group aggregate (broadcast back), the final mean re-uses the
# exact-cents trick — the interior sum stays integer and the two
# bounds enter the float expression exactly once each, so the result
# is reproducible regardless of partition order. The bounds are
# DISCRETE percentiles (percentile_disc: actual data values), not
# interpolated ones: the round-10 star fuzz caught the interpolated
# form diverging by 1 ulp between engines when the percentile falls
# between two EQUAL neighbors (Spark's lower + f*(upper-lower) is
# exact there; DuckDB's (1-f)*lower + f*upper is not), which flips
# the strict < clip-count comparison. Discrete bounds are column
# values, bit-identical on both sides by construction. At 100 TB:
# groupBy bounds is a map-side-combinable agg over the fact table, the
# join back is a broadcast (|groups| rows), and the second agg is
# again partial — no window sort over the fact table anywhere.
# [beyond-reference] robust statistics; reference has no percentile
# surface at all (scripts/03 uses plain mean/std).
# --------------------------------------------------------------------
@query(
    "star_winsorize",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)
                   AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)
                   AS hi
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high,
           ROUND(MIN(b.lo), 6) AS lo,
           ROUND(MIN(b.hi), 6) AS hi,
           ROUND((SUM(CASE WHEN o.o_totalprice >= b.lo
                            AND o.o_totalprice <= b.hi
                           THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) / 100.0
                  + SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END)
                    * MIN(b.lo)
                  + SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END)
                    * MIN(b.hi)) / COUNT(*), 6) AS winsor_mean
    FROM orders o JOIN b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def star_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    bounds = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    j = orders.join(F.broadcast(bounds), "o_orderpriority")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    low = (F.col("o_totalprice") < F.col("lo")).cast("long")
    high = (F.col("o_totalprice") > F.col("hi")).cast("long")
    interior = F.when(
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") <= F.col("hi")),
        cents,
    ).otherwise(F.lit(0))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(low).alias("n_low"),
            F.sum(high).alias("n_high"),
            F.min("lo").alias("_lo"),
            F.min("hi").alias("_hi"),
            F.sum(interior).alias("_interior"),
        )
        .select(
            "o_orderpriority",
            "n",
            "n_low",
            "n_high",
            F.round(F.col("_lo"), 6).alias("lo"),
            F.round(F.col("_hi"), 6).alias("hi"),
            F.round(
                (
                    F.col("_interior") / 100.0
                    + F.col("n_low") * F.col("_lo")
                    + F.col("n_high") * F.col("_hi")
                )
                / F.col("n"),
                6,
            ).alias("winsor_mean"),
        )
    )


# --------------------------------------------------------------------
# PageRank over the nation trade graph — the engine's iterative
# graph-analytics shape (power iteration), distinct from the
# fixpoint connected-components in datapipe: a FIXED number of
# dataframe-loop rounds, each one join + one aggregation. Graph:
# supplier-nation -> customer-nation edges weighted by lineitem
# count (one fact-table group-by builds the whole graph; everything
# after runs on |nations|^2 <= 625 rows). Simplified formulation
# (no dangling-mass redistribution), implemented IDENTICALLY in the
# oracle as 10 chained CTE iterations, so the hash pins every round's
# arithmetic. Scale: the per-iteration state is O(|nodes|), edges are
# broadcast ONCE (the fixed 10-round loop unrolls into one bounded
# plan whose joins all reuse a single BroadcastExchange — r13; only
# data-dependent iteration like datapipe_neardup_components needs
# per-round lineage cuts); the fact-table edge build — materialized
# once via localCheckpoint — is the only big shuffle.
# [beyond-reference] graph analytics.
# --------------------------------------------------------------------
_PR_ITERS = 10
_PR_DAMP = "0.85"
_PR_EDGE_SQL = """
    edges_raw AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY s.s_nationkey, c.c_nationkey
    ),
    edges AS (
        SELECT src, dst,
               CAST(w AS DOUBLE)
                 / SUM(w) OVER (PARTITION BY src) AS frac
        FROM edges_raw
        UNION ALL
        SELECT n_nationkey, n_nationkey, CAST(0 AS DOUBLE)
        FROM nation
    ),
    r0 AS (
        SELECT n_nationkey AS node, CAST(1.0 / 25 AS DOUBLE) AS rank
        FROM nation
    )
"""


def _pr_oracle() -> str:
    steps = ",\n".join(
        f"""    r{t + 1} AS (
        SELECT e.dst AS node,
               0.15 / 25 + {_PR_DAMP} * SUM(r.rank * e.frac) AS rank
        FROM r{t} r JOIN edges e ON e.src = r.node
        GROUP BY e.dst
    )"""
        for t in range(_PR_ITERS)
    )
    return f"""
    WITH {_PR_EDGE_SQL},
{steps}
    SELECT n.n_name, r.node, ROUND(r.rank, 6) AS pagerank
    FROM r{_PR_ITERS} r JOIN nation n ON n.n_nationkey = r.node
    """


@query("star_pagerank_nations", oracle=_pr_oracle())
def star_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import lineage_cut

    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges_raw = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    frac = F.col("w").cast("double") / F.sum("w").over(
        Window.partitionBy("src")
    )
    edges = (
        edges_raw.select("src", "dst", frac.alias("frac"))
        .unionByName(
            nation.select(
                F.col("n_nationkey").alias("src"),
                F.col("n_nationkey").alias("dst"),
                F.lit(0.0).alias("frac"),
            )
        )
    )
    # materialize the graph once (<= 650 rows) so the 10 iterations —
    # and the final join — reuse it instead of re-running the
    # fact-table edge build per reference
    edges = lineage_cut(edges)
    ranks = nation.select(
        F.col("n_nationkey").alias("node"),
        (F.lit(1.0) / F.lit(25)).alias("rank"),
    )
    damp = float(_PR_DAMP)
    from ..operators.staging import ab_off

    # Round-13 removed ALL mid-loop lineage cuts so the 10 joins share
    # one BroadcastExchange — but the driver bench regressed 0.79x:
    # the fully-unrolled plan (537 formatted lines) pays real
    # optimizer/codegen time that the saved materialization jobs do
    # not cover. Round 14 splits the difference: ONE cut at the
    # halfway point bounds the optimizer's input to ~5 rounds per
    # segment while costing a single eager job over the <= 25-row
    # rank state; each segment's joins still reuse ONE
    # BroadcastExchange of the checkpointed edge frame. (Mid-loop
    # cuts every round remain the tool for UNBOUNDED/data-dependent
    # iteration — datapipe_neardup_components.)
    one_cut = not ab_off("pr_single_cut")
    for i in range(_PR_ITERS):
        ranks = (
            ranks.join(F.broadcast(edges), F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                (
                    F.lit(0.15) / F.lit(25)
                    + F.lit(damp) * F.sum(F.col("rank") * F.col("frac"))
                ).alias("rank")
            )
            .select(F.col("node2").alias("node"), "rank")
        )
        if one_cut and i == _PR_ITERS // 2 - 1:
            ranks = lineage_cut(ranks)
    out = ranks.join(
        F.broadcast(nation),
        F.col("node") == F.col("n_nationkey"),
    ).select("n_name", "node", F.round("rank", 6).alias("pagerank"))
    return out


# --------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintile
# scores) — the classic marketing-analytics rollup. One fact-table
# group-by builds the per-customer RFM triple (exact cents), three
# ntile(5) windows assign quintiles with c_custkey tie-breaks, then
# the segment rollup is a tiny group-by. Scale note: ntile is a
# GLOBAL sort — fine for a dimension-sized customer table; at 1e9+
# customers use star_rfm_segments_scalable below (percentile-cut
# bucket joins, star_winsorize's bounds-broadcast shape).
# [beyond-reference] segmentation analytics.
# --------------------------------------------------------------------
@query(
    "star_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT MAX(CAST(o_orderdate AS DATE))
                          FROM orders)) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey)
                   AS r_score,
               NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary_cents, o_custkey)
                   AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS seg_monetary_cents
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def star_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # ONE orders pass (was two — round-13 scan sweep): the corpus-max
    # order date is max-over-customer-maxes off the staged per-customer
    # frame — identically MAX(o_orderdate) (max distributes over the
    # customer partition; NULL keys/dates behave the same both ways).
    per_cust = stage_boundary(
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("monetary_cents"),
        ),
        materialize=False,
    )
    max_day = per_cust.agg(F.max("last_day").alias("corpus_max"))
    rfm = (
        per_cust.crossJoin(F.broadcast(max_day))
        .select(
            "o_custkey",
            F.datediff(F.col("corpus_max"), F.col("last_day")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    scored = rfm.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary_cents", "o_custkey"))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_cents").alias("seg_monetary_cents"),
    )


# --------------------------------------------------------------------
# Gini coefficient of customer spend (revenue-concentration /
# inequality meter — the same statistic used for feature-importance
# and purity audits). Rank-weighted formulation
# G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) stays EXACT-INTEGER to
# the final division: spend is cents, and both the rank i and the
# rank-weighted sum come from the engine's distributed prefix-sum
# operator (operators/prefix.py — range partition + per-partition
# scan + K-row offset table), NOT an unpartitioned window, so the
# sort scales out. Oracle uses the plain ROW_NUMBER twin.
# [beyond-reference] inequality statistics.
# --------------------------------------------------------------------
@query(
    "star_gini_spend",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
        FROM cust
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(x) AS BIGINT) AS total_cents,
           -- i*x and (n+1)*Σx widened to HUGEINT before multiplying:
           -- rank x cents products pass 2^63 around 1e9 customers
           -- (Spark side mirrors with decimal(38,0) sums)
           ROUND((2.0 * SUM(CAST(i AS HUGEINT) * x)
                  - (COUNT(*) + 1) * SUM(x))
                 / (CAST(COUNT(*) AS DOUBLE) * SUM(x)), 6) AS gini
    FROM r
    """,
)
def star_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sum

    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("x")
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    # one prefix-sum pass: summing the constant 1 in (x, o_custkey)
    # order IS the global rank i — no second range-partitioned scan
    ranked = global_prefix_sum(cust, ["x", "o_custkey"], "one", "i")
    # i*x and (n+1)*Σx widen to decimal(38,0) before multiplying (==
    # oracle HUGEINT): rank x cents products wrap long around 1e9
    # customers
    dd = lambda c: c.cast("decimal(38,0)")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("x").alias("total_cents"),
        F.round(
            (
                F.lit(2.0) * F.sum(dd(F.col("i")) * F.col("x"))
                - dd(F.count(F.lit(1)) + 1) * F.sum("x")
            )
            / (F.count(F.lit(1)).cast("double") * F.sum("x")),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------
# Equi-DEPTH histogram (equal-population buckets) of order totals —
# the complement of the fixed-edge equi-width histogram: bucket
# edges are the exact k-quantiles, so every bucket holds ~n/k rows
# and the histogram adapts to skew (what you want for partition-size
# planning and drift baselines). Edges come from ONE percentile
# aggregate (no global sort), broadcast back as a 1-row frame; the
# bucket assignment is a codegen'd CASE over k-1 edges. Exact-cents
# sums inside each bucket.
# --------------------------------------------------------------------
_EQD_K = 8


@query(
    "star_equidepth_histogram",
    oracle=f"""
    WITH e AS (
        SELECT quantile_cont(o_totalprice,
                             [0.125, 0.25, 0.375, 0.5,
                              0.625, 0.75, 0.875]) AS edges
        FROM orders
    ),
    b AS (
        SELECT len(list_filter(e.edges, x -> x < o.o_totalprice))
                   AS bucket,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o CROSS JOIN e
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY bucket
    """,
)
def star_equidepth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    qs = [i / _EQD_K for i in range(1, _EQD_K)]
    edges = orders.agg(
        F.expr(
            f"percentile(o_totalprice, array({','.join(str(q) for q in qs)}))"
        ).alias("edges")
    )
    j = orders.crossJoin(F.broadcast(edges))
    bucket = F.size(
        F.filter(
            F.col("edges"), lambda x: x < F.col("o_totalprice")
        )
    )
    return (
        j.select(
            bucket.alias("bucket"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------
# RFM segmentation, SCALE TWIN: the percentile-cut variant promised
# by star_rfm_segments' docstring. Instead of three global ntile
# sorts, quintile EDGES come from one exact-percentile aggregate
# (combinable, no sort), broadcast back, and each score is "1 +
# number of edges strictly below the value" — a codegen'd CASE.
# Semantics differ from ntile exactly where ntile is arbitrary: ties
# at a boundary land in ONE bucket here (value-determined) instead
# of being split by the tie-break, which is what you want at 1e9
# customers anyway. Output shape matches the ntile variant.
# --------------------------------------------------------------------
@query(
    "star_rfm_segments_scalable",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT MAX(CAST(o_orderdate AS DATE))
                          FROM orders)) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    e AS (
        SELECT quantile_cont(-recency_days, [0.2, 0.4, 0.6, 0.8])
                   AS re,
               quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fe,
               quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8])
                   AS me
        FROM rfm
    ),
    scored AS (
        SELECT 1 + len(list_filter(e.re, x -> x < -r.recency_days))
                   AS r_score,
               1 + len(list_filter(e.fe, x -> x < r.frequency))
                   AS f_score,
               1 + len(list_filter(e.me, x -> x < r.monetary_cents))
                   AS m_score,
               r.monetary_cents
        FROM rfm r CROSS JOIN e
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS seg_monetary_cents
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def star_rfm_segments_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.staging import stage_boundary

    # ONE orders pass (was two — round-13 scan sweep, same derivation
    # as star_rfm_segments): corpus-max = max over the staged
    # per-customer maxes; the quantile-edge aggregate and the scoring
    # join both read the staged frame.
    per_cust = stage_boundary(
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("monetary_cents"),
        ),
        materialize=False,
    )
    max_day = per_cust.agg(F.max("last_day").alias("corpus_max"))
    rfm = (
        per_cust.crossJoin(F.broadcast(max_day))
        .select(
            (-F.datediff(F.col("corpus_max"), F.col("last_day"))).alias(
                "neg_recency"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    qs = "array(0.2, 0.4, 0.6, 0.8)"
    edges = rfm.agg(
        F.expr(f"percentile(neg_recency, {qs})").alias("re"),
        F.expr(f"percentile(frequency, {qs})").alias("fe"),
        F.expr(f"percentile(monetary_cents, {qs})").alias("me"),
    )
    j = rfm.crossJoin(F.broadcast(edges))

    def _score(edge_col: str, value):
        return (
            F.lit(1)
            + F.size(F.filter(F.col(edge_col), lambda x: x < value))
        ).cast("int")

    return (
        j.select(
            _score("re", F.col("neg_recency").cast("double")).alias(
                "r_score"
            ),
            _score("fe", F.col("frequency").cast("double")).alias(
                "f_score"
            ),
            _score(
                "me", F.col("monetary_cents").cast("double")
            ).alias("m_score"),
            "monetary_cents",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("seg_monetary_cents"),
        )
    )


# --------------------------------------------------------------------
# Markov transition matrix over event sequences: P(next event type |
# current type) per user journey — the sequence-analytics primitive
# behind Markov attribution (removal effect), predictive prefetch,
# and anomaly detection on event grammars. Transitions come from ONE
# lead() window per user (same (ts, event_id) ordering contract as
# the session family); probabilities are exact integer ratios.
# Scale: one user_id exchange, then an O(|types|^2) aggregate.
# --------------------------------------------------------------------
@query(
    "star_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
    ),
    t AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    m AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src FROM t GROUP BY src)
    SELECT t.src, t.dst, t.n,
           ROUND(CAST(t.n AS DOUBLE) / m.n_src, 6) AS p
    FROM t JOIN m USING (src)
    """,
)
def star_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    t = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = t.groupBy("src").agg(F.sum("n").alias("n_src"))
    return t.join(F.broadcast(m), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_src"), 6).alias(
            "p"
        ),
    )


# --------------------------------------------------------------------
# Salted null-safe join — the skew twin star_null_safe_join's
# docstring promises. A null-safe (<=>) hash join funnels EVERY
# null-key row into one partition: at 100 TB a heavily-null key makes
# that partition the straggler. This twin rewrites the null bucket
# BEFORE the exchange: null fact keys become one of S synthetic salted
# keys (spread by a payload hash), the dimension's null row is
# replicated to all S salts, and the join degrades to a plain
# equi-join whose null traffic hash-partitions S ways. Same result,
# same oracle, no single-partition bucket. The SHUFFLE_HASH hint keeps
# the exchange in the plan at fixture scale so the demonstrated shape
# is the 100 TB one (broadcast would hide it).
# --------------------------------------------------------------------
_NULL_SALTS = 8
_NULL_TAG = "\x00null\x00"  # cannot collide with a real priority string


@query(
    "star_null_safe_join_salted",
    oracle="""
    WITH o AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio_key,
                      o_totalprice
               FROM orders),
    d AS (SELECT NULLIF(p, '1-URGENT') AS prio_key,
                 substring(p, 1, 1) AS prio_rank
          FROM (SELECT DISTINCT o_orderpriority AS p FROM orders))
    SELECT COALESCE(d.prio_rank, '?') AS prio_rank,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM o JOIN d ON o.prio_key IS NOT DISTINCT FROM d.prio_key
    GROUP BY prio_rank
    """,
)
def star_null_safe_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
            "prio_key"
        ),
        "o_totalprice",
    )
    d = (
        orders.select(F.col("o_orderpriority").alias("p"))
        .distinct()
        .select(
            F.nullif(F.col("p"), F.lit("1-URGENT")).alias("prio_key"),
            F.substring("p", 1, 1).alias("prio_rank"),
        )
    )
    # fact side: nulls spread over S salted keys by a payload hash
    salted_null = F.concat(
        F.lit(_NULL_TAG),
        F.pmod(F.hash("o_totalprice"), F.lit(_NULL_SALTS)).cast("string"),
    )
    o2 = o.withColumn(
        "jk",
        F.when(F.col("prio_key").isNull(), salted_null).otherwise(
            F.col("prio_key")
        ),
    )
    # dim side: the null row fans out to every salt; non-null rows pass
    d2 = d.withColumn(
        "salt",
        F.when(
            F.col("prio_key").isNull(),
            F.expr(f"sequence(0, {_NULL_SALTS - 1})"),
        ).otherwise(F.expr("array(-1)")),
    ).select(
        "prio_key",
        "prio_rank",
        F.explode("salt").alias("s"),
    ).withColumn(
        "jk",
        F.when(
            F.col("prio_key").isNull(),
            F.concat(F.lit(_NULL_TAG), F.col("s").cast("string")),
        ).otherwise(F.col("prio_key")),
    )
    return (
        o2.join(d2.hint("SHUFFLE_HASH"), "jk")
        .groupBy(F.coalesce(d2["prio_rank"], F.lit("?")).alias("prio_rank"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------
# Triangle counting + global clustering coefficient — the graph
# primitive beyond star_pagerank_nations / neardup components. Graph:
# parts are nodes, an edge connects two parts co-purchased in >= 2
# DISTINCT orders (the market-basket support threshold — a projection
# of a random bipartite graph is otherwise dense, ~1.2M spurious
# single-co-occurrence edges over 20k parts at sf0.1, whose wedge
# space OOM'd the 8g envelope; support pruning is how co-occurrence
# graphs are ALWAYS built before triangle analytics, and it is the
# same linear groupBy that produced the edges). Triangle enumeration
# then uses the DEGREE-ORDERED orientation
# (compact-forward / Schank-Wagner): every edge points from its
# lower-(degree, id) endpoint to the higher one, so each triangle has
# exactly ONE apex with two out-edges and the wedge join's fan-out is
# bounded by the max ORIENTED out-degree (~sqrt(2|E|)) instead of the
# max raw degree — the difference between a skew-safe join and a
# hub-node blow-up at 100 TB. Each triangle is counted exactly once:
# of a wedge's two orderings only the one whose closing edge matches
# the orientation survives the final join.
# --------------------------------------------------------------------
@query(
    "star_triangle_count",
    oracle="""
    WITH thr AS (
        SELECT GREATEST(2, COUNT(*) // 75000) AS min_sup FROM orders
    ),
    e0 AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1
        JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                        AND l1.l_partkey < l2.l_partkey
        GROUP BY a, b
        HAVING COUNT(DISTINCT l1.l_orderkey)
               >= (SELECT min_sup FROM thr)
    ),
    deg AS (
        SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        GROUP BY v
    ),
    o AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
                    THEN e0.a ELSE e0.b END AS u,
               CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
                    THEN e0.b ELSE e0.a END AS v
        FROM e0
        JOIN deg da ON da.v = e0.a
        JOIN deg db ON db.v = e0.b
    ),
    tri AS (
        SELECT COUNT(*) AS n_tri
        FROM o o1
        JOIN o o2 ON o1.u = o2.u AND o1.v <> o2.v
        JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v
    ),
    -- d * 1.0 FIRST so the wedge product runs in double: the BIGINT
    -- d*(d-1) wraps for a ~3e9-degree hub (identical double on both
    -- engines; / is float division in both already)
    w AS (SELECT SUM(d * 1.0 * (d - 1) / 2) AS n_wedges FROM deg)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
           CAST(tri.n_tri AS BIGINT) AS n_triangles,
           ROUND(3.0 * tri.n_tri / NULLIF(w.n_wedges, 0), 6)
               AS clustering_coeff
    FROM tri, w
    """,
)
def star_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_orderkey is a non-null PK under TPC-H, but the old equality
    # self-join (and the oracle's) would silently drop a NULL-key row
    # where groupBy would pair parts inside a null-key basket — make
    # the invariant explicit rather than rely on the data model.
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select("l_orderkey", "l_partkey")
    )
    # FRACTIONAL min-support (Apriori-style): an absolute threshold
    # stops pruning as baskets accumulate over a fixed catalog — at
    # the generated sf1 the abs-2 edge set is 1.2M and the wedge join
    # goes super-linear (17.7x/decade, measured). A threshold linear
    # in basket count keeps the edge set stable for stationary
    # co-occurrence RATES: max(2, n_orders/75000) leaves the sf0.01 /
    # sf0.1 results bit-identical and scales the cut thereafter.
    thr = load(spark, sf_dir, "orders").agg(
        F.greatest(
            F.lit(2).cast("long"), F.floor(F.count(F.lit(1)) / 75000)
        ).alias("min_sup")
    )
    # Round-11 rewrite (the cooccurrence_baskets pattern): an order
    # carries a BOUNDED number of lineitems, so the co-purchase pair
    # space is a per-order ARRAY — collect_set the parts per order
    # and explode twice within the row, a < b. This replaces the
    # lineitem SELF-join on l_orderkey (the fact table shuffled twice
    # plus an SMJ) with ONE fact shuffle and two map-side Generates;
    # collect_set's dedup makes count(1) per (a, b) exactly the old
    # countDistinct(l_orderkey). Identical output, 1.35x faster
    # cold-cache at sf0.1, and the edge build no longer contains a
    # fact-fact join to mis-plan.
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    e0 = (
        per_order.select(F.explode("parts").alias("a"), F.col("parts"))
        .select("a", F.explode("parts").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("sup"))
        .join(F.broadcast(thr), F.col("sup") >= F.col("min_sup"))
        .select("a", "b")
    )
    from ..operators.staging import stage_boundary

    e0 = stage_boundary(e0, materialize=False)  # consumed by 4 branches
    deg = (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    deg = stage_boundary(deg, materialize=False)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = (
        e0.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    o = stage_boundary(o, materialize=False)  # 3-way self-join below
    o1 = o.select(F.col("u"), F.col("v").alias("x"))
    o2 = o.select(F.col("u"), F.col("v").alias("y"))
    o3 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = (
        o1.join(o2, "u")
        .filter(F.col("x") != F.col("y"))
        .join(o3, ["x", "y"])
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    # d * 1.0 FIRST: the long d*(d-1) product wraps for a ~3e9-degree
    # hub; double math matches the oracle bit-for-bit
    wedges = deg.agg(
        F.sum(F.col("d") * 1.0 * (F.col("d") - 1) / 2).alias("n_wedges")
    )
    counts = e0.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return (
        tri.crossJoin(wedges)
        .crossJoin(counts)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_tri").cast("long").alias("n_triangles"),
            F.round(
                3.0 * F.col("n_tri")
                / F.nullif(F.col("n_wedges"), F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


# --------------------------------------------------------------------
# Interval concurrency (sweep-line aggregation): how many orders are
# "open" (ordered but not yet fully shipped) on each day, reported as
# the monthly peak + the first day it was hit. The interval-algebra
# primitive behind max-concurrent-sessions / resource-occupancy
# queries, expressed as the classic +1/-1 boundary sweep: intervals
# become two delta events, a per-day groupBy collapses them to
# O(distinct days) rows, and the running sum over the DAY SPINE gives
# concurrency. The unpartitioned cumulative window runs over a
# calendar-bounded frame (~2.4k rows for the 6.5-year fixture — fixed
# by the calendar, not the data volume); were the spine itself huge,
# operators/prefix.py's two-level prefix sum is the drop-in
# replacement, as with the rank statistics.
# --------------------------------------------------------------------
@query(
    "star_concurrent_intervals",
    oracle="""
    WITH iv AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
               MAX(CAST(l.l_shipdate AS DATE)) AS e
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    d AS (
        SELECT s AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT e + 1 AS day, -1 AS delta FROM iv
    ),
    per_day AS (SELECT day, SUM(delta) AS delta FROM d GROUP BY day),
    run AS (
        SELECT day,
               SUM(delta) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS open_orders
        FROM per_day
    ),
    m AS (
        SELECT strftime(day, '%Y-%m') AS month, day, open_orders,
               MAX(open_orders) OVER (PARTITION BY strftime(day, '%Y-%m'))
                   AS peak
        FROM run
    )
    SELECT month,
           CAST(peak AS BIGINT) AS peak_open_orders,
           MIN(day) AS first_peak_day
    FROM m WHERE open_orders = peak
    GROUP BY month, peak
    """,
)
def star_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("e"))
        .select(F.col("o_orderdate").cast("date").alias("s"), "e")
    )
    d = iv.select(F.col("s").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    per_day = d.groupBy("day").agg(F.sum("delta").alias("delta"))
    wrun = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = per_day.select(
        "day", F.sum("delta").over(wrun).alias("open_orders")
    )
    m = run.select(
        F.date_format("day", "yyyy-MM").alias("month"),
        "day",
        "open_orders",
    ).withColumn(
        "peak", F.max("open_orders").over(Window.partitionBy("month"))
    )
    return (
        m.filter(F.col("open_orders") == F.col("peak"))
        .groupBy("month", "peak")
        .agg(F.min("day").alias("first_peak_day"))
        .select(
            "month",
            F.col("peak").cast("long").alias("peak_open_orders"),
            "first_peak_day",
        )
    )


# --------------------------------------------------------------------
# Pareto frontier (the SKYLINE operator, Borzsony/Kossmann/Stocker
# ICDE'01): per brand, the parts no other same-brand part dominates
# (lower-or-equal price AND greater-or-equal size, strictly better in
# at least one). The naive form is a quadratic NOT-EXISTS self-join;
# for a 2-D skyline it collapses to two windows — max(size) over
# strictly-cheaper rows (RANGE to -1 on integer cents) and max(size)
# among equal-price rows — so the whole operator is one hash exchange
# on brand + one sort, skew-bounded by brand group size at any scale.
# The oracle states the dominance definition directly as NOT EXISTS;
# the engine plan never materializes a pair.
# --------------------------------------------------------------------
@query(
    "star_pareto_frontier",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
        FROM part
        WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
    )
    SELECT a.p_partkey, a.p_brand, a.p_size, a.price_c
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.p_brand = a.p_brand
          AND b.price_c <= a.price_c
          AND b.p_size >= a.p_size
          AND (b.price_c < a.price_c OR b.p_size > a.p_size)
    )
    """,
)
def star_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull()
        )
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            _cents("p_retailprice").alias("price_c"),
        )
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("p_brand", "price_c")
    dominated = (
        F.coalesce(F.max("p_size").over(w_cheaper), F.lit(-1))
        >= F.col("p_size")
    ) | (F.max("p_size").over(w_equal) > F.col("p_size"))
    return (
        p.withColumn("dom", dominated)
        .filter(~F.col("dom"))
        .select("p_partkey", "p_brand", "p_size", "price_c")
    )


# --------------------------------------------------------------------
# Hypothetical-set rank functions (SQL:2016 RANK(x) WITHIN GROUP):
# "what rank WOULD this value get" — the aggregate family Spark has
# no native form of, rebuilt from its definitions as conditional
# counts: rank = 1 + count(v < x), dense_rank = 1 + count(distinct
# v < x), percent_rank = (rank-1)/n, cume_dist = (count(v <= x)+1)
# /(n+1) — the inserted row counts itself in the <=-set, per the
# SQL:2016 hypothetical-set definition.
# Three probe prices fan out via a broadcast 3-row literal table, so
# the whole thing is one pass over orders with map-side-combinable
# aggregates per (status, probe).
# --------------------------------------------------------------------
@query(
    "star_hypothetical_rank",
    oracle="""
    SELECT o_orderstatus, probe,
           CAST(1 + SUM(CASE WHEN o_totalprice < probe THEN 1 ELSE 0 END)
                AS BIGINT) AS hyp_rank,
           CAST(1 + COUNT(DISTINCT CASE WHEN o_totalprice < probe
                                        THEN o_totalprice END)
                AS BIGINT) AS hyp_dense_rank,
           ROUND(SUM(CASE WHEN o_totalprice < probe THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS hyp_percent_rank,
           ROUND((SUM(CASE WHEN o_totalprice <= probe THEN 1 ELSE 0 END)
                  + 1)
                 * 1.0 / (COUNT(*) + 1), 6) AS hyp_cume_dist
    FROM orders
    CROSS JOIN (SELECT unnest([50000.0, 150000.0, 300000.0]) AS probe) p
    GROUP BY o_orderstatus, probe
    """,
)
def star_hypothetical_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    probes = orders.sparkSession.createDataFrame(
        [(50000.0,), (150000.0,), (300000.0,)], "probe double"
    )
    below = F.sum(
        F.when(F.col("o_totalprice") < F.col("probe"), 1).otherwise(0)
    )
    at_or_below = F.sum(
        F.when(F.col("o_totalprice") <= F.col("probe"), 1).otherwise(0)
    )
    return (
        orders.join(F.broadcast(probes))
        .groupBy("o_orderstatus", "probe")
        .agg(
            (1 + below).cast("long").alias("hyp_rank"),
            (
                1
                + F.countDistinct(
                    F.when(
                        F.col("o_totalprice") < F.col("probe"),
                        F.col("o_totalprice"),
                    )
                )
            ).cast("long").alias("hyp_dense_rank"),
            F.round(below * 1.0 / F.count(F.lit(1)), 6).alias(
                "hyp_percent_rank"
            ),
            F.round(
                (at_or_below + 1) * 1.0 / (F.count(F.lit(1)) + 1), 6
            ).alias("hyp_cume_dist"),
        )
    )


# --------------------------------------------------------------------
# Sequential-pattern support (PrefixSpan's unit step): for every
# ordered event-type pair (a ->...-> b, ANY gap), the number and share
# of users whose history contains some a-event strictly before some
# b-event. star_markov_transitions counts ADJACENT steps; any-gap
# containment is the sequence-mining primitive and reduces to pure
# per-group min/max: user u supports (a, b) iff min_ts(a) < max_ts(b)
# — so the whole pattern table is one groupBy(user, type) for
# (min_ts, max_ts) plus a per-user 5x5 pair join of 5-row sides,
# never a scan of raw event pairs. Ties on the boundary timestamps
# break by event_id (strictly-before means a's earliest fires before
# b's latest by (ts, event_id) order), keeping both engines exact.
# --------------------------------------------------------------------
@query(
    "star_sequential_pattern",
    oracle="""
    WITH b AS (
        SELECT user_id, event_type,
               MIN(ROW(ts, event_id)) AS min_k,
               MAX(ROW(ts, event_id)) AS max_k
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY user_id, event_type
    ),
    u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM b),
    pairs AS (
        SELECT a.event_type AS type_a, c.event_type AS type_b,
               COUNT(*) AS n_support
        FROM b a JOIN b c ON a.user_id = c.user_id
                         AND a.event_type <> c.event_type
        WHERE a.min_k < c.max_k
        GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n_support AS BIGINT) AS n_support,
           ROUND(n_support * 1.0 / u.n_users, 6) AS support
    FROM pairs, u
    """,
)
def star_sequential_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    # user_id nulls are excluded up front: the oracle's equality
    # self-join (a.user_id = c.user_id) never pairs NULL users and its
    # COUNT(DISTINCT user_id) never counts them, but groupBy('user_id')
    # WOULD create a null-key group whose types the double explode
    # would pair (same hazard star_cooccurrence_baskets filters for).
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    b = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("min_k"),
        F.max(F.struct("ts", "event_id")).alias("max_k"),
    )
    from ..operators.staging import stage_boundary

    # Round-11 rewrite: the per-user 5x5 pair space used to be a
    # user_id self-join of b — which the static planner BROADCAST at
    # sf1 (the SortAggregate key= audit catch); shuffle-hinting it was
    # safe but paid two extra exchanges of an O(users x types) frame.
    # Since the per-user side is bounded by the EVENT-TYPE ENUM (<=
    # ~5 rows per user, the same boundedness this query's design
    # already assumes), the pair space collapses to a per-user ARRAY:
    # collect_list the (type, min_k, max_k) structs, explode twice
    # within the row. One user-keyed shuffle and two map-side
    # Generates replace the self-join entirely — no join to
    # mis-plan, no skew surface, measured 2.3x faster at sf0.1 and
    # bit-identical output (pair counting is order-independent, so
    # collect_list's non-determinism cannot leak).
    per_user = b.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type", "min_k", "max_k")).alias(
            "arr"
        )
    )
    # staged: the user count and the pair explosion both read the
    # per-user frame — without the boundary each branch re-scans
    # events through the two aggregates
    per_user = stage_boundary(per_user, materialize=False)
    n_users = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    before = F.col("a.min_k") < F.col("c.max_k")  # lexicographic
    pairs = (
        per_user.select(F.explode("arr").alias("a"), F.col("arr"))
        .select("a", F.explode("arr").alias("c"))
        .filter(
            (F.col("a.event_type") != F.col("c.event_type")) & before
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("c.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_support"))
    )
    return pairs.crossJoin(F.broadcast(n_users)).select(
        "type_a",
        "type_b",
        F.col("n_support").cast("long").alias("n_support"),
        F.round(F.col("n_support") * 1.0 / F.col("n_users"), 6).alias(
            "support"
        ),
    )


# --------------------------------------------------------------------
# Time-decay (recency-weighted) aggregation — the "decayed count /
# decayed revenue" profile feature: recent activity counts more, old
# activity fades hyperbolically (weight = 1 / (1 + age_days)).
# Exponential decay is the textbook form but exp() bit-parity across
# engines is not guaranteed; hyperbolic decay keeps every term a
# RATIONAL of integers, and each term is rounded to integer
# micro-units BEFORE the sum, so the aggregate is an exact BIGINT sum
# — commutative, partial-agg safe, bit-identical under any shuffle
# order at any scale. One scan, one groupBy(user), map-side
# combinable.
# --------------------------------------------------------------------
@query(
    "star_decayed_recency_agg",
    oracle="""
    WITH t AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               datediff('day', CAST(ts AS DATE), DATE '2024-02-01')
                   AS age_days
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(cents * 1000000.0
                               / (1 + GREATEST(age_days, 0)))
                         AS BIGINT)) AS BIGINT) AS decayed_micro,
           CAST(SUM(CAST(ROUND(1000000.0 / (1 + GREATEST(age_days, 0)))
                         AS BIGINT))
                AS BIGINT) AS decayed_count_micro
    FROM t GROUP BY user_id
    """,
)
def star_decayed_recency_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.datediff(
                F.lit("2024-02-01").cast("date"), F.col("ts").cast("date")
            ).alias("age_days"),
        )
    )
    # clamp: events at/after the reference date (possible on fuzz or
    # late-arriving data) weigh 1, never a zero/negative denominator
    w = 1 + F.greatest(F.col("age_days"), F.lit(0))
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.round(F.col("cents") * 1000000.0 / w).cast("long")
        ).alias("decayed_micro"),
        F.sum(F.round(1000000.0 / w).cast("long")).alias(
            "decayed_count_micro"
        ),
    )


# --------------------------------------------------------------------
# Interval merge (union of overlapping intervals — "gaps and islands"
# with real spans): per customer, coalesce overlapping order-activity
# intervals (order date -> last shipment) into islands, reporting the
# island count and total covered days. The classic sweep: sort a
# customer's intervals by start, an island BREAKS where the start
# exceeds the running max end so far (cumulative max over the
# preceding frame), island id = running count of breaks, then one
# group-by. Two windows + one aggregate, all partitioned by customer
# — no self-join, no pair blow-up, skew bounded by one customer's
# order count at any scale.
# --------------------------------------------------------------------
@query(
    "star_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT o.o_custkey AS custkey,
               CAST(o.o_orderdate AS DATE) AS s,
               MAX(CAST(l.l_shipdate AS DATE)) AS e
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
    ),
    flagged AS (
        SELECT custkey, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS brk
        FROM iv
    ),
    islands AS (
        SELECT custkey, s, e,
               SUM(brk) OVER (PARTITION BY custkey ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM flagged
    ),
    merged AS (
        SELECT custkey, island,
               MIN(s) AS m_start, MAX(e) AS m_end
        FROM islands GROUP BY custkey, island
    )
    SELECT custkey,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(datediff('day', m_start, m_end) + 1) AS BIGINT)
               AS covered_days
    FROM merged GROUP BY custkey
    """,
)
def star_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("e"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("s"),
            "e",
        )
    )
    w_prev = (
        Window.partitionBy("custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "brk",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("brk").over(w_run))
    merged = islands.groupBy("custkey", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    return merged.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.datediff("m_end", "m_start") + 1).alias("covered_days"),
    )


# --------------------------------------------------------------------
# Deterministic MODE aggregate — most frequent value per group with
# an EXPLICIT tie-break (highest count, then smallest value). Spark
# 3.4+ and DuckDB both ship mode(), but neither documents tie order,
# so cross-engine parity (and rerun stability at scale, where
# partial-agg merge order varies) requires spelling the tie-break:
# count per (group, value), then one rank window per group. Two
# map-side-combinable shuffles, group cardinality bounded.
# --------------------------------------------------------------------
@query(
    "star_mode_aggregate",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderpriority IS NOT NULL
        GROUP BY o_orderstatus, o_orderpriority
    ),
    r AS (
        SELECT o_orderstatus, o_orderpriority, n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority) AS rn
        FROM c
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
)
def star_mode_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("mode_count"),
        )
    )


# --------------------------------------------------------------------
# Sample autocorrelation function (ACF, lags 1..7) of daily revenue —
# the seasonality diagnostic that decides whether ref_mase_seasonal_eval's
# weekly-naive forecast is even worth running: r_k is the Pearson
# correlation between the daily series and itself shifted k days.
# Shape at scale: orders collapse to the O(days) daily frame first
# (one agg, calendar-bounded forever), the 7 lags fan out via a
# broadcast literal table, and each lag pairs the daily frame with
# itself through ONE date-arithmetic equi-join — never a window over
# the raw orders. Exactness: daily revenue is integer dollars, all
# five correlation sums are exact integers (Spark DECIMAL(38,0) ==
# DuckDB HUGEINT — BIGINT products would overflow past sf1), and the
# final Pearson formula is one double expression over identical
# integers (sqrt is correctly rounded, so bit-identical).
# --------------------------------------------------------------------
@query(
    "star_autocorrelation",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(ROUND(SUM(o_totalprice)) AS BIGINT) AS rev
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY day
    ),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    pairs AS (
        SELECT l.lag, a.rev AS x, b.rev AS y
        FROM daily a
        JOIN lags l ON TRUE
        JOIN daily b ON b.day = a.day + CAST(l.lag AS INT)
    ),
    s AS (
        -- operands widened BEFORE the multiply: a BIGINT*BIGINT
        -- product overflows 64 bits once daily revenue passes ~3e9
        -- (~sf30) — DuckDB would abort, non-ANSI Spark would wrap
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
           (n * sxy - sx * sy)
               / NULLIF(sqrt((n * sxx - sx * sx)
                             * (n * syy - sy * sy)), 0) AS acf
    FROM s
    """,
)
def star_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # staged: the daily frame feeds BOTH sides of the lag self-join —
    # unstaged, Catalyst re-derives it twice, i.e. two full scans of
    # orders at 100 TB for an O(days) calendar-bounded frame
    daily = stage_boundary(
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice")).cast("long").alias("rev")),
        materialize=False,
    )
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("day").alias("d"), F.col("rev").alias("x"))
    b = daily.select(F.col("day").alias("d2"), F.col("rev").alias("y"))
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.expr("d2 = date_add(d, lag)"))
        .select("lag", "x", "y")
    )
    # widen operands BEFORE multiplying: (x*y) in 64-bit long wraps
    # silently once daily revenue passes ~3e9 (~sf30); decimal(38,0)
    # products stay exact (Spark keeps 38-digit precision, matching
    # DuckDB's HUGEINT product in the oracle)
    dec = lambda c: F.sum(c).cast("double")
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(dx).alias("sx"),
        dec(dy).alias("sy"),
        dec(dx * F.col("y")).alias("sxy"),
        dec(dx * F.col("x")).alias("sxx"),
        dec(dy * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "lag",
        n.alias("n_pairs"),
        (num / F.nullif(den, F.lit(0.0))).alias("acf"),
    )
