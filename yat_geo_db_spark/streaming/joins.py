"""Stream-stream joins (Structured Streaming's interval join).

No reference analog (SURVEY.md §2.7) — this is the streaming generalization
of the as-of/temporal family (relational.temporal): correlate two event
streams on a key within a bounded time interval. The watermark + interval
bound is what makes unbounded state safe: Spark can discard buffered rows
older than `watermark + lookback`, so state size is O(rate × window), not
O(stream length) — the property that lets the same query run forever on a
100 TB/day feed.

The function is stream/batch agnostic (unified model): applied to batch
DataFrames the watermark is a no-op and the join is an ordinary equi-join
with a range residual — which is also how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def click_view_interval_join(
    clicks: DataFrame,
    views: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pair every click with all views by the same user in the preceding
    `lookback` (inclusive of the same instant). Both sides carry a
    watermark so streaming state is bounded; on batch input the watermark
    is ignored and semantics are identical."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    cond = F.expr(
        f"user_id = v_user_id AND "
        f"view_ts BETWEEN click_ts - INTERVAL {lookback} AND click_ts"
    )
    return c.join(v, cond, "inner").drop("v_user_id")
