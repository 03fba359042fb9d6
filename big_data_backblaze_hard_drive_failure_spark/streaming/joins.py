"""Streaming joins: stream-static enrichment and stream-stream
interval join.

The two join modes Structured Streaming supports, each with its scale
contract spelled out:

* **Stream-static**: the static side is re-read per micro-batch and
  broadcast when small — the streaming twin of the batch dimension
  join. No state is kept; correctness is per-batch.

* **Stream-stream inner interval join**: both sides are watermarked
  and the join condition bounds event time on BOTH ends
  (``click.ts <= purchase.ts <= click.ts + horizon``), so each side's
  buffered state is evictable once the watermark passes the interval —
  bounded state at any scale. Without the time bound Spark would have
  to buffer both streams forever (it rejects the plan in append mode).

At 100 TB/day the interval join shuffles both streams by the equality
key (user_id) once; state per key is O(events inside the horizon), and
watermark eviction keeps executor state stores flat. This is the
Spark-first re-expression of a CEP/funnel correlation the reference
computes offline (scripts/03_feature_engineering.py window joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON = "1 hour"
DEFAULT_LATENESS = "30 minutes"


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: broadcast the dimension under each
    micro-batch's plan. Stateless."""
    return stream.join(F.broadcast(dim), key)


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = DEFAULT_HORIZON,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Stream-stream inner interval join: attribute each purchase to
    the click(s) by the same user within ``horizon`` before it.

    Both inputs must carry an event-time column ``ts``; each gets its
    own watermark so Spark can bound both state stores. The result
    streams in append mode (inner interval joins emit as soon as both
    sides arrive; eviction happens at watermark + horizon).
    """
    c = clicks.withWatermark("ts", lateness).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", lateness).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def attribute_clicks_left_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = DEFAULT_HORIZON,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, with its
    attributed purchase(s) — or nulls when no purchase arrived inside
    the horizon. The outer semantics are what makes this stateful in a
    way the inner join isn't: a click can only be declared UNMATCHED
    once the watermark proves no qualifying purchase can still arrive,
    so null rows are emitted with watermark delay, not immediately.
    Same bounded-state contract as the inner join (both sides
    watermarked + time-bounded condition); unmatched state is evicted
    exactly when it's emitted.

    Scale: identical shuffle/state profile to the inner join plus the
    per-click 'matched yet?' bit; the emission delay is the price of
    exact unmatched semantics on an unbounded stream."""
    c = clicks.withWatermark("ts", lateness).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", lateness).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "left_outer").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )
