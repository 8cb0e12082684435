"""Structured Streaming: the same window transformations run on a file
stream with Trigger.AvailableNow and must agree with their batch twins
(unified model). State/watermark wiring is exercised for tumbling and
session windows."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.streaming.windows import (
    batch_sessionize,
    events_stream,
    session_windows,
    tumbling_counts,
)
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def _events_source(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return events, events_stream(spark, src, schema)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_tumbling_stream_matches_batch(spark, tmp_path):
    events, stream = _events_source(spark, tmp_path)
    name = _run_stream(tumbling_counts(stream), "tumbling_test")
    got = spark.sql(f"SELECT window_start, event_type, n FROM {name}")
    want = tumbling_counts(events).select("window_start", "event_type", "n")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_session_stream_total_events_conserved(spark, tmp_path):
    events, stream = _events_source(spark, tmp_path)
    name = _run_stream(session_windows(stream, gap="15 minutes"), "session_test")
    got = spark.sql(f"SELECT * FROM {name}")
    assert got.agg(F.sum("n_events")).first()[0] == events.count()
    # batch sessionizer (window-function twin) conserves events too
    batch = batch_sessionize(events, gap_minutes=15)
    assert batch.agg(F.sum("n_events")).first()[0] == events.count()
