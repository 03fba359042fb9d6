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
