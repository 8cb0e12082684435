"""Streaming aggregations over the `events` stream: tumbling / sliding /
session windows with watermark-based late-data handling, plus a stateful
per-user sessionizer. Same transformations run on the batch `events` table
(Structured Streaming's unified model) — tests exercise both via
`Trigger.AvailableNow` on a file source.

Scale notes: watermark bounds state; window aggregations shuffle on
(window, keys); state store partitions = shuffle partitions — size
accordingly at 100 TB (and prefer RocksDB state store off-heap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from yat_geo_db_spark.relational.queries import dsum


def events_stream(spark, source_dir: str, schema) -> DataFrame:
    """File-based stream of events parquet drops (the production analog is
    Kafka/Kinesis; the transformation DAG is identical)."""
    return spark.readStream.schema(schema).parquet(source_dir)


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-event-type counts in tumbling windows; watermark drops data later
    than `watermark` past the max seen event time."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_rates(events: DataFrame, width: str = "30 minutes",
                  slide: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    """Sliding-window event rates (each event lands in width/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_windows(events: DataFrame, gap: str = "15 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows via the built-in session_window (gap-based;
    state closes once the watermark passes the gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def assign_sessions(events: DataFrame, gap_minutes: int = 15) -> DataFrame:
    """Per-EVENT session assignment (the building block batch_sessionize
    aggregates and association_rules baskets on): adds `session_id`,
    a per-user running count of gap-breaks. One user-keyed shuffle; the
    lag and running-sum windows share the same (ts, event_id) sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # micros, not ts.cast("long"): the cast truncates to whole SECONDS,
    # silently merging sessions whose sub-second gap is just over the
    # threshold — diverging from session_window's exact semantics
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = (
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    sess = F.sum(new_session).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_id", sess)


def batch_sessionize(events: DataFrame, gap_minutes: int = 15) -> DataFrame:
    """Batch-mode sessionization (same semantics as session_windows, computed
    with window functions): a new session starts when the gap to the previous
    event of the same user exceeds `gap_minutes`. Deterministic → used as the
    oracle-checkable twin of the streaming path."""
    return (
        assign_sessions(events, gap_minutes)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def watermarked_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-id within a bounded horizon:
    dropDuplicatesWithinWatermark keeps ONE row per id among arrivals
    whose event times fall within the watermark delay of each other —
    the at-least-once-source dedup whose state actually EXPIRES (plain
    streaming dropDuplicates grows its id set forever; here ids older
    than the watermark are evicted, so state is O(ids per horizon), not
    O(ids ever)). The horizon is the contract: a duplicate arriving
    later than `delay` after the original's event time may pass."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        id_cols
    )
