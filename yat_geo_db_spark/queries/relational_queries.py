"""Relational operator registry — the generic Spark-SQL coverage the
reference lacks entirely (SURVEY.md §2.7), exercised on the TPC-H-ish
fixtures: joins (broadcast/shuffle/semi/anti/outer), aggregations, rollup,
windows + frames, set ops, JSON/string/date/math functions, sessionization.

Determinism contract with the DuckDB oracle (relational.queries docstring):
double sums go through DECIMAL per-row casts, computed int columns are
aligned to the same width on both sides, timestamps leave as strings or
epoch integers — so the driver's order-insensitive value hash matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yat_geo_db_spark.relational import queries as rq
from yat_geo_db_spark.relational.temporal import asof_join, band_join, scd2_intervals
from yat_geo_db_spark.streaming.windows import batch_sessionize, session_windows
from yat_geo_db_spark.testdata import load_table


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


#: exact, engine-portable sum fragment (mirror of relational.queries.dsum):
#: per-row floor(x*10^s + 0.5) is pure IEEE arithmetic DuckDB and Spark
#: execute identically; the BIGINT sum is exact (DuckDB widens to HUGEINT);
#: the final hugeint→double cast and double division are correctly rounded
#: in both engines. 1e{s} literals are DOUBLE in both SQL dialects.
def _dsum(expr: str, scale: int) -> str:
    m = f"1e{scale}"
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {m} + CAST(0.5 AS DOUBLE)) AS BIGINT))"
        f" AS DOUBLE) / {m})"
    )


# --------------------------------------------------------------------------
# Spark callables
# --------------------------------------------------------------------------

def q1(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return rq.q1_pricing_summary(lineitem)


def q3(spark, sf_dir):
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return rq.q3_shipping_priority(customer, orders, lineitem)


def q5(spark, sf_dir):
    region, nation, customer, orders, lineitem, supplier = _t(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return rq.q5_local_supplier_volume(region, nation, customer, orders, lineitem, supplier)


def q18(spark, sf_dir):
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return rq.q18_large_orders(customer, orders, lineitem)


def top_orders(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.top_orders_per_customer(orders, k=3)


def running_total(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.customer_running_total(orders)


def rollup(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.sales_rollup(orders)


def cube(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.sales_cube(orders)


def grouping_sets(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.sales_grouping_sets(orders)


def pivot(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.sales_pivot(orders)


def distinct_nations(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return rq.segment_distinct_nations(customer)


def set_ops(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return rq.segment_set_ops(customer)


def json_stats(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    return rq.events_json_stats(events).withColumn(
        "sum_k", F.col("sum_k").cast("long")
    )


def time_buckets(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    return rq.events_time_buckets(events)


def date_arithmetic(spark, sf_dir):
    """Date arithmetic coverage: diffs, offsets, truncation, month ends,
    day-of-week — all built-in date expressions over orders."""
    (orders,) = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch_start"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("q"),
    )


def string_funcs(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return rq.part_string_funcs(part)


def math_funcs(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return rq.lineitem_math_funcs(lineitem)


def join_flavors(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return rq.order_join_flavors(customer, orders)


def sessionize(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    out = batch_sessionize(events, gap_minutes=15)
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
    )


def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix (relational.queries.
    event_transitions): per-user lead() sequences → (current, next)
    counts and P(next|current). One user shuffle + one tiny pair agg;
    the oracle is the same lead window in SQL."""
    from yat_geo_db_spark.relational.queries import event_transitions

    (events,) = _t(spark, sf_dir, "events")
    return event_transitions(events).orderBy("cur_type", "next_type")


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
),
pairs AS (
  SELECT cur_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
)
SELECT cur_type, next_type, n,
       round(CAST(n AS DOUBLE) /
             sum(n) OVER (PARTITION BY cur_type), 6) AS p_next
FROM pairs
ORDER BY cur_type, next_type
"""


def scd2(spark, sf_dir):
    """Type-2 SCD build: each user's consecutive runs of the same
    event_type collapse to one validity-interval row (valid_to = next
    run's start, NULL while current). One shuffle on user_id; the lag /
    lead / row_number windows share a single (ts, event_id) sort
    (relational.temporal.scd2_intervals)."""
    (events,) = _t(spark, sf_dir, "events")
    out = scd2_intervals(events)
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


def twap_q(spark, sf_dir):
    """Per-type time-weighted average of event values (relational.
    temporal.time_weighted_avg): each sample holds until the next —
    the mean a density-biased plain avg gets wrong. Span sums as exact
    integer micros; the weighted sum is dsum fixed-point."""
    from yat_geo_db_spark.relational.temporal import time_weighted_avg

    (events,) = _t(spark, sf_dir, "events")
    return time_weighted_avg(
        events, ["event_type"], "ts", "value", "event_id"
    ).orderBy("event_type")


_TWAP_SQL = f"""
WITH seg AS (
  SELECT event_type,
         value AS v,
         lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
           - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
kept AS (
  SELECT event_type, v, dur_us,
         CAST(dur_us AS DOUBLE) / 1000000.0 AS dur_s
  FROM seg WHERE dur_us IS NOT NULL
)
SELECT event_type,
       count(*) + 1 AS n_samples,
       round(CAST(sum(dur_us) AS DOUBLE) / 1000000.0, 6) AS span_s,
       round(CASE WHEN sum(dur_us) > 0 THEN
         {_dsum('CASE WHEN v IS NOT NULL THEN v * dur_s ELSE 0.0 END', 4)}
         / (CAST(sum(dur_us) AS DOUBLE) / 1000000.0) END, 6) AS twap
FROM kept
GROUP BY event_type
ORDER BY event_type
"""


def funnel_times_q(spark, sf_dir):
    """Time-to-convert distribution (relational.temporal.
    funnel_completion_times): conversion seconds for completed
    view→click→purchase chains (1-day per-hop gap) reduced to
    count + exact p50/p90 — where-a-funnel-is-slow in one row."""
    from yat_geo_db_spark.relational.temporal import funnel_completion_times

    (events,) = _t(spark, sf_dir, "events")
    chains = funnel_completion_times(
        events, ["view", "click", "purchase"], max_gap_minutes=1440
    )
    return chains.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(conversion_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(conversion_s, 0.9)"), 6).alias("p90_s"),
    )


_FUNNEL_TIMES_SQL = """
WITH v AS (
  SELECT event_id AS sid, user_id, ts AS t0
  FROM events WHERE event_type = 'view'
),
c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
h1 AS (
  SELECT sid, user_id, t0, cts FROM (
    SELECT v.sid, v.user_id, v.t0, c.ts AS cts,
           row_number() OVER (
             PARTITION BY v.sid ORDER BY c.ts ASC, c.event_id DESC
           ) AS rn
    FROM v JOIN c ON v.user_id = c.user_id AND c.ts >= v.t0
  ) WHERE rn = 1
    AND epoch_us(CAST(cts AS TIMESTAMP)) - epoch_us(CAST(t0 AS TIMESTAMP))
        <= CAST(1440 AS BIGINT) * 60 * 1000000
),
h2 AS (
  SELECT sid, t0, pts FROM (
    SELECT h1.sid, h1.t0, h1.cts, p.ts AS pts,
           row_number() OVER (
             PARTITION BY h1.sid ORDER BY p.ts ASC, p.event_id DESC
           ) AS rn
    FROM h1 JOIN p ON h1.user_id = p.user_id AND p.ts >= h1.cts
  ) WHERE rn = 1
    AND epoch_us(CAST(pts AS TIMESTAMP)) - epoch_us(CAST(cts AS TIMESTAMP))
        <= CAST(1440 AS BIGINT) * 60 * 1000000
),
secs AS (
  SELECT CAST(epoch_us(CAST(pts AS TIMESTAMP))
              - epoch_us(CAST(t0 AS TIMESTAMP)) AS DOUBLE) / 1000000.0
           AS conversion_s
  FROM h2
)
SELECT count(*) AS n_converted,
       round(quantile_cont(conversion_s, 0.5), 6) AS p50_s,
       round(quantile_cont(conversion_s, 0.9), 6) AS p90_s
FROM secs
"""


def dau_mau_q(spark, sf_dir):
    """DAU / trailing-30-day actives / stickiness per day
    (relational.queries.dau_mau_stickiness) — exact via the bounded
    (day,user)-pair explode, never a per-day rescan. Day cast to
    TIMESTAMP on both sides (driver date-canonicalization contract)."""
    from yat_geo_db_spark.relational.queries import dau_mau_stickiness

    (events,) = _t(spark, sf_dir, "events")
    out = dau_mau_stickiness(events, window_days=30)
    return out.select(
        F.col("day").cast("timestamp").alias("day"),
        "dau",
        "window_active",
        "stickiness",
    ).orderBy("day")


_DAU_MAU_SQL = """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events
),
dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
spread AS (
  SELECT day + CAST(o.off AS INT) AS day, u
  FROM pairs, unnest(range(0, 30)) AS o(off)
),
mau AS (SELECT day, count(DISTINCT u) AS window_active FROM spread GROUP BY day)
SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau,
       CAST(m.window_active AS BIGINT) AS window_active,
       round(CAST(d.dau AS DOUBLE) / m.window_active, 6) AS stickiness
FROM dau d JOIN mau m ON d.day = m.day
ORDER BY day
"""


def funnel_timeout_q(spark, sf_dir):
    """Multi-step timeout funnel (relational.temporal.funnel_with_timeout
    over next_after_join, the forward as-of): view → click → purchase
    with a 1-day per-hop gap; one key shuffle per hop, no event-level
    self-join explosion. The oracle replays each hop as an
    earliest-following window with the engine's (ts asc, id desc) tie
    rule and the same gap filter."""
    from yat_geo_db_spark.relational.temporal import funnel_with_timeout

    (events,) = _t(spark, sf_dir, "events")
    return funnel_with_timeout(
        events, ["view", "click", "purchase"], max_gap_minutes=1440
    ).orderBy("step_idx")


_FUNNEL_TIMEOUT_SQL = """
WITH v AS (
  SELECT event_id AS sid, user_id, ts AS t0
  FROM events WHERE event_type = 'view'
),
c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
h1 AS (
  SELECT sid, user_id, cts FROM (
    SELECT v.sid, v.user_id, v.t0, c.ts AS cts,
           row_number() OVER (
             PARTITION BY v.sid ORDER BY c.ts ASC, c.event_id DESC
           ) AS rn
    FROM v JOIN c ON v.user_id = c.user_id AND c.ts >= v.t0
  ) WHERE rn = 1
    AND epoch_us(CAST(cts AS TIMESTAMP)) - epoch_us(CAST(t0 AS TIMESTAMP))
        <= CAST(1440 AS BIGINT) * 60 * 1000000
),
h2 AS (
  SELECT sid FROM (
    SELECT h1.sid, h1.cts, p.ts AS pts,
           row_number() OVER (
             PARTITION BY h1.sid ORDER BY p.ts ASC, p.event_id DESC
           ) AS rn
    FROM h1 JOIN p ON h1.user_id = p.user_id AND p.ts >= h1.cts
  ) WHERE rn = 1
    AND epoch_us(CAST(pts AS TIMESTAMP)) - epoch_us(CAST(cts AS TIMESTAMP))
        <= CAST(1440 AS BIGINT) * 60 * 1000000
)
SELECT 0 AS step_idx, 'view' AS step, (SELECT count(*) FROM v) AS n
UNION ALL
SELECT 1, 'click', (SELECT count(*) FROM h1)
UNION ALL
SELECT 2, 'purchase', (SELECT count(*) FROM h2)
ORDER BY step_idx
"""


def scd2_lookup_q(spark, sf_dir):
    """Point-in-time SCD2 lookup (relational.temporal.scd2_lookup_join):
    build the event-type validity intervals, then look up, for each
    event shifted +7 minutes, the version valid AT that instant —
    boundary crossings, still-current versions, and past-the-last-run
    lookups all exercised. Rides asof_join: one key shuffle, no range
    join."""
    from yat_geo_db_spark.relational.temporal import (
        scd2_intervals,
        scd2_lookup_join,
    )

    (events,) = _t(spark, sf_dir, "events")
    dim = scd2_intervals(events)
    facts = events.select(
        "event_id",
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 7 MINUTES")).alias("ts"),
    )
    out = scd2_lookup_join(facts, dim, ["user_id"], payload=("event_type",))
    return out.select(
        "event_id", "user_id", F.col("dim_event_type")
    ).orderBy("event_id")


_SCD2_LOOKUP_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
starts AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
),
dim AS (
  SELECT user_id, event_type,
         ts AS valid_from,
         lead(ts) OVER w AS valid_to
  FROM starts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
facts AS (
  SELECT event_id, user_id,
         CAST(ts AS TIMESTAMP) + INTERVAL 7 MINUTE AS fts
  FROM events
)
SELECT f.event_id, f.user_id, d.event_type AS dim_event_type
FROM facts f
LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND f.fts >= d.valid_from
 AND (d.valid_to IS NULL OR f.fts < CAST(d.valid_to AS TIMESTAMP))
ORDER BY f.event_id
"""


_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
starts AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type,
       epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
       epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP)) AS valid_to_us,
       CAST(row_number() OVER w AS INT) AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM starts
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def scd2_upsert(spark, sf_dir):
    """Incremental SCD2 maintenance, hash-checked against the FULL
    rebuild: build the dimension from the first half of event time,
    apply the second half as a CDC increment, and the oracle rebuilds
    from scratch over all events — row equality proves the
    incremental-view-maintenance contract. The time split is the exact
    midpoint of the event-time range in epoch micros (deterministic,
    engine-portable), which also guarantees the append-only
    precondition."""
    from yat_geo_db_spark.relational.temporal import scd2_apply_increment

    (events,) = _t(spark, sf_dir, "events")
    stats = events.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    ev = events.crossJoin(F.broadcast(stats))
    base = ev.filter(F.unix_micros("ts") < F.col("mid_us")).drop("mid_us")
    incr = ev.filter(F.unix_micros("ts") >= F.col("mid_us")).drop("mid_us")
    out = scd2_apply_increment(scd2_intervals(base), incr)
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


def gap_fill(spark, sf_dir):
    """Hourly densification + forward fill per user (explicit gap flag).
    Exact per-bucket sums; per-key spine bounded by key lifetime."""
    (events,) = _t(spark, sf_dir, "events")
    return rq.gap_fill_hourly(events)


_GAP_FILL_SQL = f"""
WITH obs AS (
  SELECT user_id,
         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT)
           AS h,
         {_dsum('value', 2)} AS v
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM obs GROUP BY 1),
spine AS (SELECT user_id, unnest(range(mn, mx + 1)) AS h FROM span),
j AS (
  SELECT s.user_id, s.h, o.v
  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
)
SELECT user_id, h AS hour_bucket, v AS value,
  last_value(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
  v IS NULL AS is_gap
FROM j
"""


def q4(spark, sf_dir):
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return rq.q4_order_priority(lineitem, orders)


def q17(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return rq.q17_small_quantity_revenue(lineitem, part)


def value_deciles(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.order_value_deciles(orders)


def interval_join_batch(spark, sf_dir):
    """Batch run of the stream-stream interval join (unified model —
    streaming.joins.click_view_interval_join is stream/batch agnostic)."""
    from yat_geo_db_spark.streaming.joins import click_view_interval_join

    (events,) = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    out = click_view_interval_join(clicks, views)
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
        "view_id",
        F.unix_micros("view_ts").alias("view_ts_us"),
    )


def asof_click_view(spark, sf_dir):
    """As-of join: every click paired with the user's latest prior (or
    same-instant) view. Union+window form — one shuffle on user_id, no
    range-join explosion (relational.temporal.asof_join)."""
    (events,) = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        views,
        on=["user_id"],
        ts_col="ts",
        right_payload=("event_id", "ts", "value"),
        prefix="view_",
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("view_event_id").alias("view_id"),
        F.unix_micros("view_ts").alias("view_ts_us"),
        F.round("view_value", 2).alias("view_value"),
    )


def quantity_band_join(spark, sf_dir):
    """Non-equi band join: lineitem quantities bucketed into [lo, hi)
    ranges via a broadcast nested-loop against a 3-row bands dim
    (relational.temporal.band_join), then aggregated per band."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    spark_bands = spark.createDataFrame(
        [("small", 0.0, 10.0), ("mid", 10.0, 25.0), ("large", 25.0, 60.0)],
        "band string, lo double, hi double",
    )
    joined = band_join(
        lineitem.select("l_quantity", "l_extendedprice"), spark_bands, "l_quantity"
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        rq.dsum(F.col("l_extendedprice"), 2).alias("total_price"),
    )


def session_window_native(spark, sf_dir):
    """Spark's built-in session_window on batch input (the streaming
    operator's unified-model twin; streaming.windows.session_windows —
    withWatermark is a no-op on batch). Oracle: gap-island SQL at
    microsecond precision with the operator's exact boundary semantics
    (event at ts == prev + gap starts a NEW session; end = last + gap)."""
    (events,) = _t(spark, sf_dir, "events")
    out = session_windows(events, gap="15 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


def approx_stats(spark, sf_dir):
    """Sketch aggregates — HyperLogLog++ distinct users and approximate
    value percentiles per event type. THE scale path for stats at 100 TB
    (fixed-size sketches, map-side combinable, one tiny shuffle) but
    algorithm-specific results → no DuckDB hash oracle; bounds vs exact
    answers are pytest-checked (tests/test_sketches.py)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("vp"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("vp")[0].alias("p50"),
            F.col("vp")[1].alias("p95"),
        )
    )


def map_funcs(spark, sf_dir):
    """Map-type function coverage: parse events.props JSON into a typed
    map, then map_keys/values/filter/entry counting — all built-ins."""
    (events,) = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return events.select(
        "event_id",
        F.size(m).alias("n_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys"),
        F.coalesce(
            F.aggregate(F.map_values(m), F.lit(0), lambda a, x: a + x), F.lit(0)
        ).alias("value_sum"),
        F.size(F.map_filter(m, lambda k, v: v > 50)).alias("n_big"),
    )


def array_funcs(spark, sf_dir):
    """Higher-order array function coverage over the embedding vectors:
    filter (positive components), transform (squares), exists, sort+slice.
    All JVM-side Column expressions; the lambda HOFs run interpreted, so at
    scale anything used K times gets materialized once first (PLANS.md)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    n_pos = F.size(F.filter(vec, lambda x: x > 0))
    sum_sq = F.round(
        F.aggregate(
            F.transform(vec, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    # emitted as a joined string of fixed-point micro-units: the driver's
    # value hash canonicalizes scalar cells, not arrays, and double→string
    # formatting differs between engines while integer strings don't
    top3 = F.concat_ws(
        ",",
        F.transform(
            F.slice(F.sort_array(vec, asc=False), 1, 3),
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long").cast("string"),
        ),
    )
    any_big = F.exists(vec, lambda x: x > 2.0)
    return emb.select(
        "vec_id",
        n_pos.alias("n_pos"),
        sum_sq.alias("sum_sq"),
        top3.alias("top3"),
        any_big.alias("any_big"),
    )


def exact_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (percentile_cont semantics) per event
    type — the exact complement to rel_approx_stats' sketches. Exact
    percentiles need a full sort per group (fine per-group; the sketch path
    is the whole-table-at-scale answer)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.95))").alias("vp"))
        .select(
            "event_type",
            F.round(F.col("vp")[0], 6).alias("p25"),
            F.round(F.col("vp")[1], 6).alias("p50"),
            F.round(F.col("vp")[2], 6).alias("p95"),
        )
    )


def sliding(spark, sf_dir):
    """Batch twin of streaming.sliding_rates: each event lands in
    width/slide windows (F.window works identically on batch input —
    Structured Streaming's unified model). Output window starts as epoch
    seconds for the oracle compare."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"), "n"
        )
    )


def tumbling(spark, sf_dir):
    """Batch twin of streaming.tumbling_counts (same grouping semantics,
    hour buckets as epoch seconds so the oracle compare is exact)."""
    (events,) = _t(spark, sf_dir, "events")
    bucket = (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long") * 3600
    return (
        events.groupBy(bucket.alias("window_start_s"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rq.dsum(F.col("value"), 2).alias("total_value"),
        )
    )


def q6(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return rq.q6_forecast_revenue(lineitem)


def q7(spark, sf_dir):
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    return rq.q7_volume_shipping(lineitem, orders, customer, supplier, nation)


def q8(spark, sf_dir):
    lineitem, orders, customer, supplier, nation, region, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "region", "part"
    )
    return rq.q8_market_share(
        lineitem, orders, customer, supplier, nation, region, part
    )


def q10(spark, sf_dir):
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return rq.q10_returned_items(customer, orders, lineitem, nation)


def q14(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return rq.q14_promo_revenue(lineitem, part)


def q19(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return rq.q19_disjunctive_revenue(lineitem, part)


def q22(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return rq.q22_idle_customers(customer, orders)


def window_battery(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return rq.order_window_battery(orders)


def lateral_tokens(spark, sf_dir):
    """Lateral explode coverage: posexplode(split(text)) over a fixed
    doc_id slice of `documents` (key-filtered, not limit — deterministic
    regardless of partitioning). Spark's generator expression = DuckDB's
    lateral unnest."""
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")))
        .select(
            "doc_id",
            F.col("pos").alias("pos"),
            F.col("col").alias("token"),
        )
    )


def unpivot_part(spark, sf_dir):
    """Wide→long reshaping (melt): the inverse of rel_sales_pivot. Spark's
    native unpivot emits one row per (id, measure) — a generator, no
    shuffle; value columns must share a type, so p_size casts to double."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["size", "retailprice"],
            variableColumnName="metric",
            valueColumnName="val",
        )
    )


def null_funcs(spark, sf_dir):
    """Null-handling surface: nullif / coalesce / ifnull-style defaults /
    null-safe equality — the semantics corpus SQL leans on constantly."""
    (customer,) = _t(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return customer.select(
        "c_custkey",
        seg_or_null.alias("seg_nullable"),
        F.coalesce(seg_or_null, F.lit("<masked>")).alias("seg_defaulted"),
        seg_or_null.isNull().alias("was_building"),
        F.col("c_mktsegment").eqNullSafe(seg_or_null).alias("null_safe_eq"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_nonneg"),
    )


# --------------------------------------------------------------------------
# Oracle SQL
# --------------------------------------------------------------------------

_DISC = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {_dsum('l_quantity', 2)} AS sum_qty,
  {_dsum('l_extendedprice', 2)} AS sum_base_price,
  {_dsum(_DISC, 6)} AS sum_disc_price,
  {_dsum(_CHARGE, 8)} AS sum_charge,
  round({_dsum('l_quantity', 2)} / count(*), 6) AS avg_qty,
  round({_dsum('l_extendedprice', 2)} / count(*), 6) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

_Q3_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       {_dsum(_DISC, 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-03-15'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

_Q5_SQL = f"""
SELECT n_name, {_dsum(_DISC, 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, {_dsum('l_quantity', 2)} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {_dsum('l_quantity', 2)} > 200.0
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey
LIMIT 20
"""

_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""

_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
            OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2
       AS running_total
FROM orders
"""

_ROLLUP_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
       count(*) AS n_orders, {_dsum('o_totalprice', 2)} AS total_sales
FROM orders
GROUP BY ROLLUP(order_year, o_orderstatus)
"""

_CUBE_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
       count(*) AS n_orders, {_dsum('o_totalprice', 2)} AS total_sales
FROM orders
GROUP BY CUBE(order_year, o_orderstatus)
"""

_GROUPING_SETS_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
       count(*) AS n_orders, {_dsum('o_totalprice', 2)} AS total_sales
FROM orders
GROUP BY GROUPING SETS ((order_year), (o_orderstatus), ())
"""

_PIVOT_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
  {_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)} AS sales_f,
  {_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)} AS sales_o,
  {_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)} AS sales_p
FROM orders
GROUP BY 1
"""

_DISTINCT_NATIONS_SQL = """
SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""

_SET_OPS_SQL = """
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT 'union' AS op,
       (SELECT count(*) FROM (SELECT DISTINCT c_custkey
          FROM (SELECT * FROM rich UNION ALL SELECT * FROM seg))) AS n_keys
UNION ALL
SELECT 'intersect',
       (SELECT count(*) FROM (SELECT c_custkey FROM rich
                              INTERSECT SELECT c_custkey FROM seg))
UNION ALL
SELECT 'except',
       (SELECT count(*) FROM (SELECT c_custkey FROM rich
                              EXCEPT ALL SELECT c_custkey FROM seg))
"""

_JSON_STATS_SQL = f"""
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       {_dsum('value', 2)} AS sum_value,
       round({_dsum('value', 2)} / count(*), 6) AS avg_value
FROM events
GROUP BY event_type
"""

_TIME_BUCKETS_SQL = f"""
SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
       CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
       count(*) AS n, {_dsum('value', 2)} AS v
FROM events
GROUP BY 1, 2, 3, 4
"""

#: Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6
_DATE_ARITH_SQL = """
SELECT o_orderkey,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
         AS days_since_epoch_start,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT) AS q
FROM orders
"""

_STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INT) AS name_len,
       substr(p_name, 1, 8) AS name_prefix,
       replace(p_type, ' ', '_') AS type_snake,
       CAST(len(string_split(p_type, ' ')) AS INT) AS type_words,
       p_brand || '|' || p_type AS brand_type,
       lpad(CAST(p_size AS VARCHAR(30)), 4, '0') AS size_padded
FROM part
"""

_MATH_FUNCS_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(l_extendedprice * l_tax, 4) AS tax_amount,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln
FROM lineitem
"""

_JOIN_FLAVORS_SQL = """
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
SELECT 'semi' AS op,
       (SELECT count(*) FROM customer
        WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)) AS n
UNION ALL
SELECT 'anti',
       (SELECT count(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey))
UNION ALL
SELECT 'left_null',
       (SELECT count(*) FROM customer
        LEFT JOIN (SELECT DISTINCT o_custkey FROM big) b
        ON c_custkey = b.o_custkey
        WHERE b.o_custkey IS NULL)
"""

def association_rules_q(spark, sf_dir):
    """Directional association rules over 15-min session baskets
    (relational.queries.association_rules): support/confidence/lift per
    ordered event-type pair — all-integer counts, engine-exact ratios.
    The oracle replays sessionization + basket self-join in SQL."""
    from yat_geo_db_spark.relational.queries import association_rules

    (events,) = _t(spark, sf_dir, "events")
    return association_rules(events, min_pair_n=5, top_k=50)


_ASSOC_RULES_SQL = """
WITH secs AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(us) OVER w IS NULL
              OR us - lag(us) OVER w > 15 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM secs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type,
         CAST(sum(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
  FROM marked
),
baskets AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
ns AS (
  SELECT count(*) AS n_sessions
  FROM (SELECT DISTINCT user_id, session_id FROM baskets)
),
items AS (
  SELECT event_type, count(*) AS n_item FROM baskets GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         count(*) AS n_ab
  FROM baskets a
  JOIN baskets b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type != b.event_type
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT antecedent, consequent, CAST(n_ab AS BIGINT) AS n_ab,
       round(CAST(n_ab AS DOUBLE) / n_sessions, 6) AS support,
       round(CAST(n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       round((CAST(n_ab AS DOUBLE) / ia.n_item)
             / (CAST(ib.n_item AS DOUBLE) / n_sessions), 6) AS lift
FROM pairs
JOIN items ia ON pairs.antecedent = ia.event_type
JOIN items ib ON pairs.consequent = ib.event_type, ns
ORDER BY lift DESC, antecedent, consequent
LIMIT 50
"""


_SESSIONIZE_SQL = """
WITH secs AS (
  -- exact microsecond gaps (the engine compares unix_micros, not
  -- second-truncated casts)
  SELECT user_id, event_id, ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts, us,
         CASE WHEN lag(us) OVER w IS NULL
              OR us - lag(us) OVER w > 15 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM secs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         CAST(sum(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(epoch_us(CAST(ts AS TIMESTAMP))) AS session_start_us,
       max(epoch_us(CAST(ts AS TIMESTAMP))) AS session_end_us
FROM sess
GROUP BY user_id, session_id
"""

_SLIDING_SQL = """
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec FROM events
),
w AS (
  -- window starts are the multiples of slide(600) in (sec - width(1800), sec]
  SELECT unnest(range(600 * ((sec - 1800) // 600 + 1),
                      600 * (sec // 600) + 1, 600)) AS window_start_s
  FROM e
)
SELECT window_start_s, count(*) AS n FROM w GROUP BY 1
"""

_TUMBLING_SQL = f"""
SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT) * 3600
         AS window_start_s,
       event_type, count(*) AS n, {_dsum('value', 2)} AS total_value
FROM events
GROUP BY 1, 2
"""

#: DuckDB: JSON → MAP(VARCHAR, INT); the fixture props are flat {"k": int}
_MAP_FUNCS_SQL = """
WITH m AS (
  SELECT event_id, CAST(json(props) AS MAP(VARCHAR, INTEGER)) AS pm
  FROM events
)
SELECT event_id,
  CAST(cardinality(pm) AS INT) AS n_entries,
  list_aggregate(list_sort(map_keys(pm)), 'string_agg', ',') AS keys,
  CAST(coalesce(list_sum(map_values(pm)), 0) AS INT) AS value_sum,
  CAST(len(list_filter(map_values(pm), x -> x > 50)) AS INT) AS n_big
FROM m
"""

#: DuckDB list_* twins of Spark's array HOFs; the fold is prepend-seeded so
#: both engines reduce left-to-right from 0.0 (see parity playbook)
_ARRAY_FUNCS_SQL = """
SELECT vec_id,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
  round(list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(embedding, x -> x * x)),
      (acc, x) -> acc + x), 6) AS sum_sq,
  list_aggregate(
      list_transform(list_reverse_sort(embedding)[1:3],
                     x -> CAST(CAST(floor(x * 1e6 + 0.5) AS BIGINT) AS VARCHAR)),
      'string_agg', ',') AS top3,
  CAST(len(list_filter(embedding, x -> x > 2.0)) > 0 AS BOOLEAN) AS any_big
FROM embeddings
"""

def table_stats_q(spark, sf_dir):
    """ANALYZE-style column profile (relational.dq.table_stats) over
    orders: ONE scan, ONE aggregate (multi-count_distinct expand),
    stack() unpivot to the per-column report. Exact ndv keeps the
    oracle aligned; the approx tier is a documented swap."""
    from yat_geo_db_spark.relational.dq import table_stats

    (orders,) = _t(spark, sf_dir, "orders")
    return table_stats(orders).orderBy("column_name")


def _table_stats_sql() -> str:
    cols = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
    parts = []
    for c, kind in cols:
        if kind == "num":
            mn, mx = f"round(min(CAST({c} AS DOUBLE)), 6)", f"round(max(CAST({c} AS DOUBLE)), 6)"
            al = "CAST(NULL AS DOUBLE)"
        elif kind == "ts":
            mn = f"round(min(CAST(epoch_us(CAST({c} AS TIMESTAMP)) AS DOUBLE)), 6)"
            mx = f"round(max(CAST(epoch_us(CAST({c} AS TIMESTAMP)) AS DOUBLE)), 6)"
            al = "CAST(NULL AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            al = f"round(avg(length({c})), 6)"
        parts.append(
            f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       round(CAST(count(*) - count({c}) AS DOUBLE) / count(*), 6)
         AS null_frac,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num, {al} AS avg_len
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


def chi_square_q(spark, sf_dir):
    """Chi-square independence screen (relational.dq.
    chi_square_independence) of event_type × day-of-week — 'does event
    mix vary by weekday'. One contingency aggregate; marginals derive
    from the cell table; fixed-point term sum."""
    from yat_geo_db_spark.relational.dq import chi_square_independence

    (events,) = _t(spark, sf_dir, "events")
    typed = events.select(
        "event_type", F.dayofweek(F.col("ts")).alias("dow")
    )
    return chi_square_independence(typed, "event_type", "dow")


def _chi_square_sql() -> str:
    return f"""
WITH typed AS (
  SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
observed AS (
  SELECT event_type, dow, count(*) AS o FROM typed GROUP BY 1, 2
),
rm AS (SELECT event_type, sum(o) AS ra FROM observed GROUP BY 1),
cm AS (SELECT dow, sum(o) AS cb FROM observed GROUP BY 1),
nn AS (SELECT sum(o) AS n FROM observed),
cells AS (
  SELECT rm.event_type, cm.dow, ra, cb, coalesce(o, 0) AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN observed USING (event_type, dow)
),
terms AS (
  SELECT CAST(o AS DOUBLE) AS o,
         CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE) AS e
  FROM cells, nn
),
dims AS (
  SELECT count(DISTINCT event_type) AS ka, count(DISTINCT dow) AS kb
  FROM observed
)
SELECT CAST(any_value(n) AS BIGINT) AS n,
       CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
       round({_dsum('(o - e) * (o - e) / e', 6)}, 6) AS chi2
FROM terms, nn, dims
GROUP BY ka, kb
"""


def corr_matrix_q(spark, sf_dir):
    """One-pass Pearson matrix (relational.dq.corr_matrix) over four
    lineitem measures — k·(k+1)/2 fixed-point sums in one aggregate,
    stack-unpivoted; the oracle repeats the sums per pair."""
    from yat_geo_db_spark.relational.dq import corr_matrix

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return corr_matrix(
        lineitem,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).orderBy("col_a", "col_b")


def _corr_matrix_sql() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    parts = []
    for a, b in pairs:
        sa, sb = _dsum(a, 4), _dsum(b, 4)
        ssa, ssb = _dsum(f"{a} * {a}", 4), _dsum(f"{b} * {b}", 4)
        sp = _dsum(f"{a} * {b}", 4)
        parts.append(
            f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       CAST(count(*) AS BIGINT) AS n,
       round(CASE WHEN CAST(count(*) AS DOUBLE) * {ssa} - {sa} * {sa} > 0
                   AND CAST(count(*) AS DOUBLE) * {ssb} - {sb} * {sb} > 0
             THEN (CAST(count(*) AS DOUBLE) * {sp} - {sa} * {sb})
                  / (sqrt(CAST(count(*) AS DOUBLE) * {ssa} - {sa} * {sa})
                     * sqrt(CAST(count(*) AS DOUBLE) * {ssb} - {sb} * {sb}))
             END, 6) AS corr
FROM base"""
        )
    sel = "\nUNION ALL\n".join(parts)
    where = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    return (
        f"WITH base AS (SELECT * FROM lineitem WHERE {where})\n"
        + sel
        + "\nORDER BY col_a, col_b"
    )


def robust_outliers_q(spark, sf_dir):
    """Median/MAD modified-z anomaly gate (relational.dq.robust_outliers)
    over event values per type — robust statistics resist the outliers
    they hunt, unlike a mean/stddev gate. Returns flagged rows only."""
    from yat_geo_db_spark.relational.dq import robust_outliers

    (events,) = _t(spark, sf_dir, "events")
    out = robust_outliers(events, ["event_type"], "value")
    return (
        out.where(F.col("is_outlier"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "robust_z",
        )
        .orderBy("event_id")
    )


_ROBUST_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
d AS (
  SELECT event_id, e.event_type, value, med
  FROM events e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM d GROUP BY event_type
),
z AS (
  SELECT event_id, d.event_type, value,
         round(med, 6) AS med, round(mad.mad, 6) AS mad,
         CASE WHEN mad.mad > 0
              THEN round(0.6745 * (value - d.med) / mad.mad, 6) END
           AS robust_z
  FROM d JOIN mad ON d.event_type = mad.event_type
)
SELECT event_id, event_type, value, med, mad, robust_z
FROM z
WHERE coalesce(abs(robust_z) > 3.5, FALSE)
ORDER BY event_id
"""


def winsorize_q(spark, sf_dir):
    """Per-type percentile clipping (relational.dq.winsorize) of event
    values at [p05, p95] — one percentile pass + broadcast bounds +
    pure projection; NULLs stay NULL (guarded out of the clamp)."""
    from yat_geo_db_spark.relational.dq import winsorize

    (events,) = _t(spark, sf_dir, "events")
    return (
        winsorize(events, ["event_type"], "value", 0.05, 0.95)
        .select("event_id", "event_type", "value", "value_w")
        .orderBy("event_id")
    )


_WINSORIZE_SQL = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS qlo,
         quantile_cont(value, 0.95) AS qhi
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       CASE WHEN value IS NOT NULL
            THEN least(greatest(value, qlo), qhi) END AS value_w
FROM events e JOIN q ON e.event_type = q.event_type
ORDER BY event_id
"""


def impute_median_q(spark, sf_dir):
    """Robust NULL repair (relational.dq.impute_median): the fixture's
    events carry no NULLs, so the query plants a deterministic dropout
    (value NULLed where event_id % 7 == 0 — both engines express the
    same corruption) and repairs it with the per-type median."""
    from yat_geo_db_spark.relational.dq import impute_median

    (events,) = _t(spark, sf_dir, "events")
    holey = events.withColumn(
        "value",
        F.when(F.col("event_id") % 7 != 0, F.col("value")),
    )
    return (
        impute_median(holey, ["event_type"], "value")
        .select("event_id", "event_type", "value", "value_filled")
        .orderBy("event_id")
    )


_IMPUTE_MEDIAN_SQL = """
WITH holey AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 != 0 THEN value END AS value
  FROM events
),
m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS gmed
  FROM holey GROUP BY event_type
),
g AS (SELECT quantile_cont(value, 0.5) AS allmed FROM holey)
SELECT event_id, h.event_type, value,
       coalesce(value, gmed, allmed) AS value_filled
FROM holey h JOIN m ON h.event_type = m.event_type, g
ORDER BY event_id
"""


_EXACT_PCTL_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type
"""

_INTERVAL_JOIN_SQL = """
SELECT c.user_id, c.event_id AS click_id,
       epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
       v.event_id AS view_id,
       epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_ts_us
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND v.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
WHERE c.event_type = 'click' AND v.event_type = 'view'
"""

#: mirror of relational.temporal.asof_join's union+window algorithm: views
#: (tag 0) sort before clicks (tag 1) at equal ts → <= semantics; among
#: equal view timestamps the largest event_id wins (same tiebreak as the
#: Spark side's (_ts, _tag, _rid) order). View attrs re-fetched by the
#: globally-unique event_id so all fields come from the one matched row.
_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, 0 AS tag,
         event_id AS rid, NULL::BIGINT AS click_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)), 1, NULL, event_id
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT *, last_value(rid IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_us, tag, rid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id
  FROM tagged
)
SELECT m.user_id, m.click_id, m.ts_us AS click_ts_us, m.view_id,
       epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_ts_us,
       round(v.value, 2) AS view_value
FROM m LEFT JOIN events v ON v.event_id = m.view_id
WHERE m.tag = 1
"""

_BAND_JOIN_SQL = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 10.0), ('mid', 10.0, 25.0), ('large', 25.0, 60.0)
)
SELECT band, count(*) AS n, {_dsum("l_extendedprice", 2)} AS total_price
FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
"""

#: session_window boundary semantics: an event at exactly prev + gap is
#: OUTSIDE the previous [ts, ts+gap) window → >= starts a new session;
#: session end = last event + gap. All at microsecond precision.
_SESSION_WINDOW_SQL = """
WITH us AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
              OR ts_us - lag(ts_us) OVER w >= 900000000
              THEN 1 ELSE 0 END AS new_s
  FROM us
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, min(ts_us) AS session_start_us,
       max(ts_us) + 900000000 AS session_end_us,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
"""

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""

_Q17_SQL = f"""
WITH thresholds AS (
  SELECT l_partkey,
         0.2 * {_dsum("l_quantity", 2)} / count(*) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT round({_dsum("l_extendedprice", 2)} / 7.0, 6) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23') p
  ON l_partkey = p_partkey
JOIN thresholds t USING (l_partkey)
WHERE l_quantity < qty_threshold
"""

_DECILES_SQL = f"""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderkey,
         o_totalprice,
         ntile(10) OVER (PARTITION BY year(o_orderdate)
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT order_year, decile, count(*) AS n,
       {_dsum("o_totalprice", 2)} AS decile_total
FROM yearly GROUP BY order_year, decile
"""

_Q6_SQL = f"""
SELECT {_dsum('l_extendedprice * l_discount', 6)} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

_Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  round({_dsum("CASE WHEN ns.n_name = 'NATION_2' "
               "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 6)}
        / {_dsum('l_extendedprice * (1 - l_discount)', 6)}, 6) AS mkt_share,
  {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS total_vol
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY 1
"""

_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_Q14_SQL = f"""
SELECT round(100.0 * {_dsum("CASE WHEN p_type = 'PROMO' "
                            "THEN l_extendedprice * (1 - l_discount) "
                            "ELSE 0.0 END", 6)}
             / {_dsum('l_extendedprice * (1 - l_discount)', 6)}, 6)
         AS promo_pct,
       {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS total_rev
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""

_Q19_SQL = f"""
SELECT {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

#: the avg-balance scalar mirrors the Spark side exactly: exact fixed-point
#: sum cast to double, divided by the count — both engines then compare
#: c_acctbal against a bit-identical double threshold
_Q22_SQL = f"""
WITH avg_bal AS (
  SELECT {_dsum('c_acctbal', 2)} / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_custkey % 7 AS INT) AS cntrycode,
       count(*) AS numcust,
       {_dsum('c_acctbal', 2)} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""

_WINDOW_BATTERY_SQL = """
SELECT o_custkey, o_orderkey,
  round(lag(o_totalprice) OVER wt, 2) AS prev_price,
  round(lead(o_totalprice) OVER wt, 2) AS next_price,
  round(first_value(o_totalprice) OVER wt, 2) AS first_price,
  CAST(dense_rank() OVER wp AS INT) AS price_rank,
  round(percent_rank() OVER wp, 6) AS price_pctrank,
  round(cume_dist() OVER wp, 6) AS price_cumedist
FROM orders
WINDOW wt AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""

#: Spark split('a b', ' ') and DuckDB string_split both keep empty tokens;
#: pos is 0-based in Spark → i-1 here (range is 1..len, end-exclusive +1)
_LATERAL_TOKENS_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, toks[CAST(u.i AS INT)] AS token
FROM d, unnest(range(1, len(toks) + 1)) AS u(i)
"""

def upsert(spark, sf_dir):
    """Batch MERGE (relational.merge.upsert_latest): a deterministic
    change set (every 10th order gets a repriced v1 row) applied over the
    v0 base; latest version wins per key. Output = the merged table."""
    from yat_geo_db_spark.relational.merge import upsert_latest

    (orders,) = _t(spark, sf_dir, "orders")

    # fixed-point floor rounding, NOT F.round: Spark rounds doubles via the
    # shortest-decimal BigDecimal repr, DuckDB via float arithmetic — they
    # disagree on half-way products like x*1.1. floor(x*100+0.5)/100 is the
    # same IEEE op sequence in both engines.
    def cents(col):
        return F.floor(col * 100 + F.lit(0.5)) / F.lit(100.0)

    base = orders.select(
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("price"),
        F.lit(0).alias("version"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            cents(F.col("o_totalprice") * 1.1).alias("price"),
            F.lit(1).alias("version"),
        )
    )
    return upsert_latest(base, updates, ["o_orderkey"], "version")


def range_frame(spark, sf_dir):
    """RANGE-frame window: per customer, order value summed over the
    trailing 30 days (value-based frame — peer rows at the same day all
    included, unlike ROWS). Exact fixed-point inner sum."""
    (orders,) = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    d = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(d)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("d"),
        rq.dsum_over(F.col("o_totalprice"), w, 2).alias("trailing_30d"),
    )


def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen week, counted
    per activity-week offset. Two hash aggregations (first-seen per user,
    distinct user-week activity) and one join — the standard shape; weeks
    are integer epoch-day arithmetic so both engines bucket identically."""
    (events,) = _t(spark, sf_dir, "events")
    week = (F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01")) / 7).cast(
        "int"
    )
    activity = events.select("user_id", week.alias("week")).distinct()
    first = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def funnel(spark, sf_dir):
    """Two-step funnel: per user, first view → earliest click strictly
    after it (within 1 hour = converted). One aggregation per step plus a
    per-user join — no event-level self-join blowup."""
    (events,) = _t(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    clicks = clicks.withColumnRenamed("user_id", "c_user")
    # the time predicate must live IN the join: as a post-filter it would
    # drop users whose clicks all precede the view instead of null-extending
    joined = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") > F.col("first_view")),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("click_ts").alias("first_click_after"))
    )
    converted = (
        F.col("first_click_after").isNotNull()
        & (
            F.unix_micros("first_click_after") - F.unix_micros("first_view")
            <= 3_600_000_000
        )
    )
    return joined.select(
        "user_id",
        F.unix_micros("first_view").alias("first_view_us"),
        F.unix_micros("first_click_after").alias("first_click_us"),
        converted.alias("converted_1h"),
    )


def division_all_late(spark, sf_dir):
    """Relational division (TPC-H Q21 shape): orders where EVERY lineitem
    shipped late (> 60 days after order date), as a semi join on the
    late set and an anti join on the on-time set — the decorrelated
    EXISTS / NOT EXISTS pair. Top customers by such orders."""
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    late_set = joined.filter(late).select("l_orderkey").distinct()
    ontime_set = joined.filter(~late).select("l_orderkey").distinct()
    qualified = (
        orders.join(
            late_set, F.col("o_orderkey") == late_set["l_orderkey"], "left_semi"
        )
        .join(
            ontime_set,
            F.col("o_orderkey") == ontime_set["l_orderkey"],
            "left_anti",
        )
    )
    return (
        qualified.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_all_late_orders"))
        .orderBy(F.desc("n_all_late_orders"), F.asc("o_custkey"))
        .limit(10)
    )


def variant_extract(spark, sf_dir):
    """Semi-structured VARIANT coverage (Spark 4's open JSON-ish type):
    parse once, extract typed paths with try_variant_get (NULL on missing
    or type-mismatched paths — the error-tolerant corpus semantics).
    VARIANT's binary encoding makes repeated path extraction much cheaper
    than re-parsing JSON text per path at scale."""
    (events,) = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
        F.is_variant_null(v).alias("is_null_doc"),
    )


_VARIANT_SQL = """
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS k,
       CAST(NULL AS INTEGER) AS absent,
       false AS is_null_doc
FROM events
"""


def hll_mergeable_rollup(spark, sf_dir):
    """Mergeable-sketch rollup (DataSketches HLL): distinct users are
    sketched once per (event_type, day) — the granularity you'd persist in
    a metrics store — then RE-aggregated to per-type totals by unioning
    sketches, never rescanning events. The 100 TB pattern: sketch at write
    time, answer distinct-count queries at any coarser grain from the
    sketch table. Estimates are algorithm-specific → rows-only check here;
    accuracy bounds are pytest-asserted against exact counts
    (tests/test_sketches.py)."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("event_type")
    )



_EXACT_DISTINCT_ROLLUP_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS exact_events,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def exact_distinct_rollup(spark, sf_dir):
    """The hash-checkable exact TWIN of the sketch family (VERDICT r9
    task 7): per event_type, the exact distinct users that
    rel_hll_mergeable_rollup/rel_approx_stats estimate, the exact event
    count rel_cms_heavy_hitters estimates, and the day grain the HLL
    rollup re-aggregates over. The sketch rows stay rows-only by design
    (estimates are algorithm-specific); this row pins the ground truth
    they are error-bound-tested against (tests/test_sketches.py), so
    the family has a driver-hash-green anchor on every round's
    testdata. One shuffle: count_distinct expands to a two-phase
    partial aggregate under AQE."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("exact_events"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
        .orderBy("event_type")
    )




def cms_rollup_error(spark, sf_dir):
    """Hash-checkable twin of cms_heavy_hitters (the HLL-error-twin
    pattern): the merged daily count-min estimates are reduced to the
    CMS GUARANTEE booleans — exact ≤ est ≤ exact + ⌈ε·N⌉ — alongside
    the exact counts. The oracle computes the exact side and asserts
    TRUE, so the hash match demonstrates the sketch build + merge +
    probe honored the bound without pretending DuckDB has a CMS."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "count_min_sketch(event_type, 0.001d, 0.99d, 42)"
        ).alias("sk")
    )
    blobs = [bytes(r["sk"]) for r in daily.collect()]
    jvm = spark._jvm
    merged = None
    for b in blobs:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(b)
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    exact = {
        r["event_type"]: (r["n"], r["N"])
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(
            F.broadcast(events.agg(F.count(F.lit(1)).alias("N")))
        )
        .collect()
    }
    import math

    rows = []
    for t in sorted(exact):
        n, total = exact[t]
        est = int(merged.estimateCount(t))
        rows.append(
            (t, n, est >= n and est <= n + math.ceil(0.001 * total))
        )
    return spark.createDataFrame(
        rows, "event_type string, exact_n long, within_bounds boolean"
    ).orderBy("event_type")


_CMS_ERROR_SQL = """
SELECT event_type, count(*) AS exact_n, TRUE AS within_bounds
FROM events GROUP BY event_type
ORDER BY event_type
"""


def hll_rollup_error(spark, sf_dir):
    """Hash-checkable twin of hll_mergeable_rollup: the merged per-type
    HLL estimate is joined against the exact count(DISTINCT user_id) and
    reduced to a BOUNDED-ERROR boolean (|approx − exact| / exact ≤ 5%,
    generous vs the ~1.6% theoretical RSE of the default lgConfigK=12).
    The oracle computes the exact side and asserts `true` — so the hash
    match demonstrates sketch-merge correctness without pretending DuckDB
    has Spark's HLL implementation. The estimate itself stays rows-only
    in the twin's parent."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


_HLL_ERROR_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
nd AS (SELECT event_type, count(*) AS n_days FROM d GROUP BY event_type),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
)
SELECT ex.event_type, exact_users, n_days, true AS within_5pct
FROM ex JOIN nd USING (event_type)
ORDER BY event_type
"""


def cms_heavy_hitters(spark, sf_dir):
    """Mergeable COUNT-MIN rollup (the frequency twin of the HLL rollup):
    a count-min sketch of event_type is built per DAY (the grain a
    metrics store persists), the daily sketches are merged — never
    rescanning events — and the merged sketch answers per-type frequency
    probes. The merge/probe runs driver-side over n_days sketch blobs (a
    metrics-store read, like the documented lookup-cache serving mode);
    the scan-side sketching is fully distributed. CMS guarantees
    est ≥ exact and est ≤ exact + ε·N — pytest asserts both bounds
    against exact counts; values are algorithm-specific → rows-only."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "count_min_sketch(event_type, 0.001d, 0.99d, 42)"
        ).alias("sk")
    )
    blobs = [bytes(r["sk"]) for r in daily.collect()]
    jvm = spark._jvm
    merged = None
    for b in blobs:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(b)
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    types = sorted(
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    )
    rows = [(t, int(merged.estimateCount(t))) for t in types]
    return spark.createDataFrame(rows, "event_type string, approx_count long")




def hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate (hypertable) rollup: events pre-aggregate to
    an HOURLY table — the grain a metrics store persists — and the daily
    answer re-aggregates the HOURLY rows, never rescanning events.
    Correct because every measure is mergeable: counts and fixed-point
    sums compose associatively, min/max compose, and the daily average is
    re-derived as merged-sum / merged-count (NOT an average of hourly
    averages). The oracle computes the daily numbers DIRECTLY from raw
    events, so the hash match proves two-level rollup ≡ direct — the
    property that makes pre-aggregation safe at 100 TB."""
    (events,) = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rq._scaled_long(F.col("value"), 4)).alias("v_scaled"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )
    return (
        hourly.groupBy(F.to_date("hour").alias("day"))
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("v_scaled").cast("double") / F.lit(1e4)).alias("sum_value"),
            F.min("v_min").alias("min_value"),
            F.max("v_max").alias("max_value"),
            F.round(
                F.sum("v_scaled").cast("double") / F.lit(1e4) / F.sum("n"), 6
            ).alias("avg_value"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "n_events", "sum_value", "min_value", "max_value", "avg_value",
        )
    )


_HYPERTABLE_SQL = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(*) AS n_events,
       {_dsum('"value"', 4)} AS sum_value,
       min("value") AS min_value,
       max("value") AS max_value,
       round({_dsum('"value"', 4)} / count(*), 6) AS avg_value
FROM events
GROUP BY 1
"""


#: discrete decay half-life: weights are exact powers of two (0.5^k with
#: integer k), so value * weight is a pure IEEE exponent shift — bit-exact
#: in every engine — and the fixed-point sum stays cross-engine stable.
DECAY_HALF_LIFE_DAYS = 7


def time_decay_totals(spark, sf_dir):
    """Time-decayed totals per event type — the metrics-store freshness
    weighting (recent activity counts more): each event contributes
    value * 0.5^floor(age_days / half_life), anchored to the newest event
    DATE in the table (data-derived, not wall clock — run-stable).

    Discrete (stepped) decay rather than continuous exp(-λ·age) is a
    deliberate exactness choice: 0.5^k for integer k is an exact double,
    so per-row terms are bit-identical across engines and the aggregate
    can use the fixed-point sum; exp() differs in the last ulp between
    libms, which poisons a hash-compared aggregate. Plan: one-row anchor
    broadcast + one scan + one groupBy — mergeable, rollup-safe (the
    per-(day,type) partial sums compose as long as they share the
    anchor)."""
    (events,) = _t(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.to_date("ts")).alias("anchor"))
    k = F.floor(
        F.datediff(F.col("anchor"), F.to_date("ts")) / DECAY_HALF_LIFE_DAYS
    )
    term = F.col("value") * F.pow(F.lit(0.5), k)
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(rq._scaled_long(term, 4)).cast("double") / F.lit(1e4)).alias(
                "decayed_sum"
            ),
        )
        .orderBy("event_type")
    )


_DECAY_TERM = (
    '"value" * power(0.5, '
    f"date_diff('day', CAST(ts AS DATE), anchor) // {DECAY_HALF_LIFE_DAYS})"
)

_TIME_DECAY_SQL = f"""
WITH a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events)
SELECT event_type, count(*) AS n_events,
       {_dsum(_DECAY_TERM, 4)} AS decayed_sum
FROM events CROSS JOIN a
GROUP BY event_type
ORDER BY event_type
"""


def try_funcs(spark, sf_dir):
    """Error-tolerant evaluation: try_cast / try_divide / try_to_number
    return NULL on malformed input instead of failing the job — the only
    sane semantics at corpus scale, where some rows are always dirty.
    Malformed inputs are synthesized deterministically from p_name."""
    (part,) = _t(spark, sf_dir, "part")
    # p_name is alphabetic → try_cast to int fails (NULL); p_size is clean
    mixed = F.when(F.col("p_partkey") % 3 == 0, F.col("p_name")).otherwise(
        F.col("p_size").cast("string")
    )
    return part.select(
        "p_partkey",
        mixed.try_cast("int").alias("maybe_int"),
        mixed.try_cast("int").isNull().alias("was_dirty"),
        F.try_divide(
            F.col("p_retailprice"), F.col("p_size") - F.col("p_size")
        ).alias("div_by_zero"),
        F.try_divide(F.col("p_retailprice"), F.lit(2.0)).alias("half_price"),
    )


_TRY_FUNCS_SQL = """
SELECT p_partkey,
  TRY_CAST(mixed AS INTEGER) AS maybe_int,
  TRY_CAST(mixed AS INTEGER) IS NULL AS was_dirty,
  CAST(NULL AS DOUBLE) AS div_by_zero,
  p_retailprice / 2.0 AS half_price
FROM (
  SELECT p_partkey, p_retailprice,
         CASE WHEN p_partkey % 3 = 0 THEN p_name
              ELSE CAST(p_size AS VARCHAR) END AS mixed
  FROM part
)
"""

_DIVISION_SQL = """
WITH j AS (
  SELECT l_orderkey, o_custkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_custkey, count(*) AS n_all_late_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM j WHERE j.l_orderkey = o_orderkey AND late)
  AND NOT EXISTS (SELECT 1 FROM j WHERE j.l_orderkey = o_orderkey AND NOT late)
GROUP BY o_custkey
ORDER BY n_all_late_orders DESC, o_custkey
LIMIT 10
"""

_COHORT_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) // 7 AS INT)
           AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY 1)
SELECT cohort_week, week - cohort_week AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first USING (user_id)
GROUP BY 1, 2
"""

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
j AS (
  SELECT v.user_id, v.first_view, min(c.ts) AS first_click_after
  FROM v LEFT JOIN events c
    ON c.user_id = v.user_id AND c.event_type = 'click'
   AND c.ts > v.first_view
  GROUP BY 1, 2
)
SELECT user_id,
       epoch_us(CAST(first_view AS TIMESTAMP)) AS first_view_us,
       epoch_us(CAST(first_click_after AS TIMESTAMP)) AS first_click_us,
       first_click_after IS NOT NULL
         AND epoch_us(CAST(first_click_after AS TIMESTAMP))
             - epoch_us(CAST(first_view AS TIMESTAMP)) <= 3600000000
         AS converted_1h
FROM j
"""

_UPSERT_SQL = """
WITH tagged AS (
  SELECT o_orderkey,
         floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) / 100.0 AS price,
         0 AS version, 0 AS src
  FROM orders
  UNION ALL
  SELECT o_orderkey,
         floor(o_totalprice * CAST(1.1 AS DOUBLE) * 100
               + CAST(0.5 AS DOUBLE)) / 100.0, 1, 1
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, price, CAST(version AS INT) AS version FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC, src DESC) AS rn
  FROM tagged
) WHERE rn = 1
"""

_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS d,
       CAST(sum(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2
         AS trailing_30d
FROM orders
"""

_UNPIVOT_SQL = """
SELECT p_partkey, metric, val FROM (
  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
                  p_retailprice AS retailprice FROM part)
  ON size, retailprice INTO NAME metric VALUE val
)
"""

_NULL_FUNCS_SQL = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_nullable,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '<masked>') AS seg_defaulted,
       nullif(c_mktsegment, 'BUILDING') IS NULL AS was_building,
       c_mktsegment IS NOT DISTINCT FROM nullif(c_mktsegment, 'BUILDING')
         AS null_safe_eq,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg
FROM customer
"""

def q13(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return rq.q13_order_count_distribution(customer, orders)


_Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15(spark, sf_dir):
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    return rq.q15_top_supplier(lineitem, supplier)


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""




def q9(spark, sf_dir):
    lineitem, orders, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    return rq.q9_product_profit(lineitem, orders, supplier, nation, part)


def q11(spark, sf_dir):
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    return rq.q11_important_parts(lineitem, supplier, nation)


def q12(spark, sf_dir):
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return rq.q12_shipmode_priority(lineitem, orders)


def q21(spark, sf_dir):
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    return rq.q21_waiting_suppliers(lineitem, orders, supplier, nation)


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_dsum("l_extendedprice * (1 - l_discount)"
              " - 0.6 * p_retailprice * l_quantity", 4)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND contains(p_name, 'red')
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""

_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4
                        + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS pv_scaled
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
  GROUP BY 1
),
tot AS (SELECT sum(pv_scaled) AS tv_scaled FROM per_part)
SELECT l_partkey,
       CAST(pv_scaled AS DOUBLE) / 1e4 AS part_value,
       CAST(tv_scaled AS DOUBLE) / 1e4 AS total_value
FROM per_part, tot
WHERE CAST(pv_scaled AS DOUBLE) > 0.001 * CAST(tv_scaled AS DOUBLE)
"""

_Q12_SQL = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS lateness,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""

_Q21_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
),
per_os AS (
  SELECT l_orderkey, l_suppkey, max(CAST(is_late AS INT)) AS me_late
  FROM li GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY 1
)
SELECT s_suppkey, s_name, numwait
FROM (
  SELECT l_suppkey, count(*) AS numwait
  FROM per_os JOIN per_o USING (l_orderkey)
  WHERE me_late = 1 AND n_supp > 1 AND n_late_supp = 1
  GROUP BY 1
) w
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""




def q2(spark, sf_dir):
    part, supplier, nation, region = _t(
        spark, sf_dir, "part", "supplier", "nation", "region"
    )
    ps = rq.synth_partsupp(part, supplier)
    return rq.q2_min_cost_supplier(part, supplier, nation, region, ps)


def q16(spark, sf_dir):
    part, supplier = _t(spark, sf_dir, "part", "supplier")
    ps = rq.synth_partsupp(part, supplier)
    return rq.q16_supplier_part_counts(part, supplier, ps)


def q20(spark, sf_dir):
    part, supplier, nation, region, lineitem = _t(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    ps = rq.synth_partsupp(part, supplier)
    return rq.q20_excess_stock(part, supplier, nation, region, ps, lineitem)


#: the synthetic partsupp as a shared oracle CTE fragment — byte-for-byte
#: the same integer congruences as relational.queries.synth_partsupp
#: (dense supplier index, not raw suppkey; exact-cents supplycost)
_PARTSUPP_CTE = """sidx AS (
  SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) - 1 AS idx
  FROM supplier
),
partsupp AS (
  SELECT p.p_partkey AS ps_partkey, s.s_suppkey AS ps_suppkey,
         CAST((p.p_partkey * 31 + i.i * 17) % 9999 + 1 AS INTEGER)
           AS ps_availqty,
         CAST((p.p_partkey * 997 + i.i * 131) % 99900 + 100 AS DOUBLE)
           / 100.0 AS ps_supplycost
  FROM part p
  CROSS JOIN unnest([0, 1, 2, 3]) AS i(i)
  CROSS JOIN (SELECT count(*) AS n_supp FROM supplier) n
  JOIN sidx s ON s.idx = (p.p_partkey * 7 + i.i * 13) % n.n_supp
)"""


_Q2_SQL = f"""
WITH {_PARTSUPP_CTE},
eligible AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
),
mc AS (
  SELECT *, min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM eligible
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       ps_supplycost AS supplycost
FROM mc JOIN part p ON mc.ps_partkey = p.p_partkey
WHERE ps_supplycost = min_cost AND p.p_size >= 15 AND p.p_type LIKE '%D'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


_Q16_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp ps JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'PRO%'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


_Q20_SQL = f"""
WITH {_PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey, 0.5 * {_dsum("l_quantity", 2)} AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
q AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN shipped sh
    ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
  WHERE ps.ps_partkey IN
        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND ps.ps_availqty > sh.half_qty
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN q ON s.s_suppkey = q.ps_suppkey
WHERE s.s_nationkey IN (
  SELECT n_nationkey FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA')
ORDER BY s_name
"""



def dq_audit_battery(spark, sf_dir):
    """Declarative data-quality audit over lineitem (+orders for the FK
    rule): not-null, range, accepted-values, uniqueness, and referential
    rules — one conditional-count aggregate over one scan for every
    row-level rule, one anti-join for the FK. Rule constants chosen so
    both outcomes (ok and violated) appear in the result."""
    from yat_geo_db_spark.relational.dq import dq_audit

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return dq_audit(
        li,
        not_null=("l_orderkey", "l_shipdate"),
        unique=("l_orderkey",),
        ranges={"l_discount": (0.0, 0.05), "l_quantity": (1.0, 50.0)},
        accepted={"l_returnflag": ("A", "N", "R"), "l_linestatus": ("O",)},
        refs=(("l_orderkey", orders, "o_orderkey"),),
    )


_DQ_AUDIT_SQL = """
WITH agg AS (
  SELECT count(*) AS n,
    count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS nn_orderkey,
    count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS nn_shipdate,
    count(CASE WHEN l_discount IS NOT NULL
               AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 END)
      AS rg_discount,
    count(CASE WHEN l_quantity IS NOT NULL
               AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 END)
      AS rg_quantity,
    count(CASE WHEN l_returnflag IS NOT NULL
               AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END)
      AS av_returnflag,
    count(CASE WHEN l_linestatus IS NOT NULL
               AND l_linestatus NOT IN ('O') THEN 1 END) AS av_linestatus,
    count(l_orderkey) - count(DISTINCT l_orderkey) AS uq_orderkey
  FROM lineitem
),
fk AS (
  SELECT count(*) AS n_viol FROM lineitem l
  WHERE l.l_orderkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
rules AS (
  SELECT 'not_null' AS rule, 'l_orderkey' AS "column",
         nn_orderkey AS n_violations, n FROM agg
  UNION ALL SELECT 'not_null', 'l_shipdate', nn_shipdate, n FROM agg
  UNION ALL SELECT 'range[0.0,0.05]', 'l_discount', rg_discount, n FROM agg
  UNION ALL SELECT 'range[1.0,50.0]', 'l_quantity', rg_quantity, n FROM agg
  UNION ALL SELECT 'accepted_values', 'l_returnflag', av_returnflag, n FROM agg
  UNION ALL SELECT 'accepted_values', 'l_linestatus', av_linestatus, n FROM agg
  UNION ALL SELECT 'unique', 'l_orderkey', uq_orderkey, n FROM agg
  UNION ALL SELECT 'referential', 'l_orderkey', fk.n_viol, agg.n
            FROM fk, agg
)
SELECT rule, "column", CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n AS BIGINT) AS n_rows, n_violations = 0 AS ok
FROM rules
"""


def cdc_apply_changes(spark, sf_dir):
    """CDC apply (relational.merge.cdc_apply): a deterministic Debezium-
    shaped change stream over the orders snapshot — every 10th key gets a
    v1 repriced update, every 15th a v1 delete, keys ≡ 0 mod 30 get BOTH
    (the delete carries the higher version and must win); plus inserts of
    brand-new keys. Output = the compacted table."""
    from yat_geo_db_spark.relational.merge import cdc_apply

    (orders,) = _t(spark, sf_dir, "orders")

    def cents(col):
        return F.floor(col * 100 + F.lit(0.5)) / F.lit(100.0)

    base = orders.select(
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("price"),
        F.lit(0).alias("version"),
    )
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        cents(F.col("o_totalprice") * 1.1).alias("price"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    dele = orders.filter(F.col("o_orderkey") % 15 == 0).select(
        "o_orderkey",
        F.lit(0.0).alias("price"),
        F.lit(2).alias("version"),
        F.lit("D").alias("op"),
    )
    ins = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        cents(F.col("o_totalprice")).alias("price"),
        F.lit(1).alias("version"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    return cdc_apply(base, changes, ["o_orderkey"], "version")


_CDC_APPLY_SQL = """
WITH tagged AS (
  SELECT o_orderkey,
         floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) / 100.0 AS price,
         0 AS version, 'U' AS op, 0 AS src
  FROM orders
  UNION ALL
  SELECT o_orderkey,
         floor(o_totalprice * CAST(1.1 AS DOUBLE) * 100
               + CAST(0.5 AS DOUBLE)) / 100.0, 1, 'U', 1
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 0.0, 2, 'D', 1 FROM orders WHERE o_orderkey % 15 = 0
  UNION ALL
  SELECT o_orderkey + 10000000,
         floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) / 100.0, 1, 'I', 1
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, price, CAST(version AS INT) AS version FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC, src DESC, op ASC) AS rn
  FROM tagged
) WHERE rn = 1 AND op <> 'D'
"""


def incr_agg_merge(spark, sf_dir):
    """Incrementally-maintained rollup (relational.merge.partial_aggregate
    + merge_partial_aggregates): lineitem arrives as three disjoint
    batches (orderkey mod 4 ∈ {0,1} | {2} | {3}); each batch is reduced
    to per-supplier mergeable state and the states are merged WITHOUT
    rescanning rows. The fixed-point sums make the merge exactly equal a
    one-shot aggregation of the union — which is what the oracle
    computes, so the hash match IS the associativity proof."""
    from yat_geo_db_spark.relational.merge import (
        merge_partial_aggregates, partial_aggregate,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    batches = [
        lineitem.filter(F.col("l_orderkey") % 4 <= 1),
        lineitem.filter(F.col("l_orderkey") % 4 == 2),
        lineitem.filter(F.col("l_orderkey") % 4 == 3),
    ]
    kw = dict(
        key_cols=["l_suppkey"],
        sum_cols=["l_quantity", "l_extendedprice"],
        min_cols=["l_shipdate"],
        max_cols=["l_shipdate"],
        scale=2,
    )
    states = [partial_aggregate(b, **kw) for b in batches]
    return merge_partial_aggregates(states, **kw).orderBy("l_suppkey")


_INCR_AGG_SQL = f"""
SELECT l_suppkey,
       count(*) AS n_rows,
       {_dsum('l_quantity', 2)} AS sum_l_quantity,
       {_dsum('l_extendedprice', 2)} AS sum_l_extendedprice,
       min(l_shipdate) AS min_l_shipdate,
       max(l_shipdate) AS max_l_shipdate
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


ZORDER_BITS = 8


def zorder_key_events(spark, sf_dir):
    """Z-order (Morton) clustering key over events(user_id, value) —
    the multi-column layout key relational.layout.zorder_write
    range-partitions on (the Delta OPTIMIZE ZORDER layout primitive).
    Returns the first 200 events in curve order; the oracle re-derives
    the same bucketing + bit interleave, so the hash match pins the
    exact key arithmetic both engines compute."""
    from yat_geo_db_spark.relational.layout import zorder_key

    (events,) = _t(spark, sf_dir, "events")
    keyed = zorder_key(
        events, ["user_id", "value"], bits=ZORDER_BITS, out_col="zval"
    )
    return (
        keyed.select("event_id", "user_id", "value", "zval")
        .orderBy("zval", "event_id")
        .limit(200)
    )


def _zorder_sql(bits: int = ZORDER_BITS) -> str:
    n = 1 << bits

    def bucket(col, mn, mx):
        span = f"(CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE))"
        raw = (
            f"least(CAST(floor((CAST({col} AS DOUBLE) - CAST({mn} AS DOUBLE))"
            f" / {span} * CAST({n} AS DOUBLE)) AS BIGINT),"
            f" CAST({n - 1} AS BIGINT))"
        )
        return f"CASE WHEN {span} > 0 THEN {raw} ELSE CAST(0 AS BIGINT) END"

    interleave = " + ".join(
        f"((({b} >> {i}) & 1) << {i * 2 + j})"
        for j, b in enumerate(("bu", "bv"))
        for i in range(bits)
    )
    return f"""
WITH stats AS (
  SELECT min(user_id) AS mnu, max(user_id) AS mxu,
         min(value) AS mnv, max(value) AS mxv
  FROM events
),
b AS (
  SELECT event_id, user_id, value,
         {bucket('user_id', 'mnu', 'mxu')} AS bu,
         {bucket('value', 'mnv', 'mxv')} AS bv
  FROM events, stats
)
SELECT event_id, user_id, value, CAST({interleave} AS BIGINT) AS zval
FROM b
ORDER BY zval, event_id
LIMIT 200
"""


def snapshot_diff_orders(spark, sf_dir):
    """Change-feed backfill (relational.merge.snapshot_diff — the
    inverse of cdc_apply): two versions of an orders-derived table
    (every 10th key repriced, every 15th dropped, every 7th key cloned
    to a brand-new id) are diffed into the I/U/D stream that would have
    produced version 2 from version 1. One full-outer key join."""
    from yat_geo_db_spark.relational.merge import snapshot_diff

    (orders,) = _t(spark, sf_dir, "orders")

    def cents(col):
        return F.floor(col * 100 + F.lit(0.5)) / F.lit(100.0)

    old = orders.select(
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    survivors = old.filter(F.col("o_orderkey") % 15 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 10 == 0,
            cents(F.col("price") * 1.1),
        ).otherwise(F.col("price")).alias("price"),
        "prio",
    )
    inserts = old.filter(F.col("o_orderkey") % 7 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "price",
        "prio",
    )
    new = survivors.unionByName(inserts)
    return snapshot_diff(old, new, ["o_orderkey"]).orderBy("o_orderkey")


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey,
         floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) / 100.0 AS price,
         o_orderpriority AS prio
  FROM orders
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0
              THEN floor(price * CAST(1.1 AS DOUBLE) * 100
                         + CAST(0.5 AS DOUBLE)) / 100.0
              ELSE price END AS price,
         prio
  FROM old WHERE o_orderkey % 15 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, price, prio FROM old WHERE o_orderkey % 7 = 0
),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         n.price AS price, n.prio AS prio,
         o.price AS old_price, o.prio AS old_prio,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, price, prio,
       CASE WHEN NOT in_old THEN 'I'
            WHEN NOT in_new THEN 'D'
            ELSE 'U' END AS op,
       CASE WHEN in_old AND in_new
            THEN concat_ws(',',
                 CASE WHEN price IS DISTINCT FROM old_price THEN 'price' END,
                 CASE WHEN prio IS DISTINCT FROM old_prio THEN 'prio' END)
            ELSE '' END AS changed
FROM j
WHERE NOT in_old OR NOT in_new
      OR price IS DISTINCT FROM old_price OR prio IS DISTINCT FROM old_prio
ORDER BY o_orderkey
"""


def interval_coalesce_shipping(spark, sf_dir):
    """Gaps-and-islands interval compaction (relational.temporal.
    coalesce_intervals): merge each supplier's overlapping shipping
    windows [shipdate, shipdate + 1..30 days] (deterministic duration
    from l_partkey; sparse l_partkey slice so real gaps survive) into
    maximal covered islands — the validity-interval compaction every
    SCD/timeline table eventually needs. One key-local window sort +
    one groupBy."""
    from yat_geo_db_spark.relational.temporal import coalesce_intervals

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    iv = lineitem.filter(F.col("l_partkey") % 50 == 0).select(
        "l_suppkey",
        F.to_date("l_shipdate").cast("timestamp").alias("ship_start"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.lit(1) + F.col("l_partkey") % 30).cast("int"),
        ).cast("timestamp").alias("ship_end"),
    )
    return coalesce_intervals(
        iv, ["l_suppkey"], "ship_start", "ship_end"
    ).orderBy("l_suppkey", "ship_start")


_INTERVAL_COALESCE_SQL = """
WITH iv AS (
  SELECT l_suppkey,
         CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_start,
         CAST(CAST(l_shipdate AS DATE)
           + CAST(1 + l_partkey % 30 AS INTEGER) AS TIMESTAMP) AS ship_end
  FROM lineitem WHERE l_partkey % 50 = 0
),
m AS (
  SELECT *,
         max(ship_end) OVER (
           PARTITION BY l_suppkey ORDER BY ship_start, ship_end
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS pme
  FROM iv
),
f AS (
  SELECT *,
         CASE WHEN pme IS NULL OR ship_start > pme THEN 1 ELSE 0 END AS ni
  FROM m
),
g AS (
  SELECT *,
         sum(ni) OVER (
           PARTITION BY l_suppkey ORDER BY ship_start, ship_end
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS isl
  FROM f
)
SELECT l_suppkey,
       min(ship_start) AS ship_start,
       max(ship_end) AS ship_end,
       count(*) AS n_merged
FROM g
GROUP BY l_suppkey, isl
ORDER BY l_suppkey, ship_start
"""


def skew_report_orders(spark, sf_dir):
    """Heavy-key diagnostic (relational.skew.skew_report): the top-10
    customers by order count with table share, ratio-to-uniform, and
    cumulative share — the profiling read that decides whether a join
    key needs salting. Top-k via TakeOrderedAndProject; the ranking
    window touches only the k survivors."""
    from yat_geo_db_spark.relational.skew import skew_report

    (orders,) = _t(spark, sf_dir, "orders")
    return skew_report(orders, ["o_custkey"], top_k=10)


_SKEW_REPORT_SQL = """
WITH c AS (
  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY o_custkey
),
t AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM c),
e AS (
  SELECT o_custkey, n_rows,
         round(n_rows / total, 6) AS share,
         round(n_rows / (total / CAST(n_keys AS DOUBLE)), 4) AS x_uniform
  FROM c, t
),
top AS (SELECT * FROM e ORDER BY n_rows DESC, o_custkey LIMIT 10)
SELECT o_custkey, n_rows, share, x_uniform,
       CAST(row_number() OVER (ORDER BY n_rows DESC, o_custkey) AS INT)
         AS rank,
       round(sum(share) OVER (
         ORDER BY n_rows DESC, o_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 6) AS cum_share
FROM top
ORDER BY rank
"""


def skew_count_distinct_parts(spark, sf_dir):
    """Two-phase skew-spread COUNT(DISTINCT) (relational.skew.
    skewed_count_distinct): distinct parts per supplier, with the
    distinct pass spread by part rather than landing every hot
    supplier's rows on one reducer. Must be row-identical to the
    single-phase count_distinct — the oracle IS the single-phase
    form."""
    from yat_geo_db_spark.relational.skew import skewed_count_distinct

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return skewed_count_distinct(
        lineitem, ["l_suppkey"], "l_partkey"
    ).orderBy("l_suppkey")


_SKEW_CD_SQL = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_distinct
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


def join_explosion_q(spark, sf_dir):
    """Pre-join blowup report (relational.skew.join_explosion_report):
    top customer keys by orders×orders-self output contribution — the
    exact n_l×n_r per-key arithmetic a planner estimates, as a
    diagnostic table. Key-count tables join, never the facts."""
    from yat_geo_db_spark.relational.skew import join_explosion_report

    (orders,) = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")[0].select(
        F.col("l_orderkey").alias("o_custkey")
    )
    return join_explosion_report(
        orders, lineitem, "o_custkey", top_k=15
    )


_JOIN_EXPLOSION_SQL = """
WITH lc AS (SELECT o_custkey, count(*) AS n_left FROM orders GROUP BY 1),
rc AS (SELECT l_orderkey AS o_custkey, count(*) AS n_right
       FROM lineitem GROUP BY 1),
prod AS (
  SELECT o_custkey, n_left, n_right,
         CAST(n_left * n_right AS BIGINT) AS out_rows
  FROM lc JOIN rc USING (o_custkey)
),
t AS (SELECT sum(out_rows) AS total FROM prod)
SELECT o_custkey, CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right, out_rows,
       round(CAST(out_rows AS DOUBLE) / total, 6) AS share_of_join
FROM prod, t
ORDER BY out_rows DESC, o_custkey
LIMIT 15
"""


def bloom_prune_join_q(spark, sf_dir):
    """Bloom-pruned equi-join (relational.skew.bloom_pruned_join):
    lineitem is pre-filtered by an 8 KiB Bloom sketch of the urgent
    orders' key set BEFORE the shuffle join — the explicit form of
    Spark's runtime bloom filter, for dims too big to broadcast.
    Bloom filters have no false negatives and the join removes false
    positives, so the result must be row-identical to the plain join
    — the oracle IS the plain join + aggregate."""
    from yat_geo_db_spark.relational.skew import bloom_pruned_join
    from yat_geo_db_spark.relational.queries import dsum

    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    urgent = orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    joined = bloom_pruned_join(lineitem, urgent, "l_orderkey")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity"), 4).alias("sum_qty"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("sum_disc_price"),
        )
        .orderBy("l_returnflag")
    )


_BLOOM_PRUNE_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       {_dsum('l_quantity', 4)} AS sum_qty,
       {_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price
FROM lineitem
JOIN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON l_orderkey = o.o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


HIST_LO, HIST_HI, HIST_BINS = 900.0, 105000.0, 128
HIST_QS = (0.5, 0.95, 0.99)


def hist_quantile_merge(spark, sf_dir):
    """Mergeable quantile state (relational.merge.histogram_state →
    merge_histogram_states → quantile_from_histogram): lineitem arrives
    as three disjoint batches; each reduces to a per-returnflag
    fixed-bin price histogram, the integer states merge exactly, and
    p50/p95/p99 come from the MERGED state — the quantile leg of the
    incremental rollup family (sums/min/max = partial_aggregate,
    distinct = HLL, quantiles = this). The oracle recomputes the
    one-shot histogram, so the hash match proves merge associativity."""
    from yat_geo_db_spark.relational.merge import (
        histogram_state, merge_histogram_states, quantile_from_histogram,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    batches = [
        lineitem.filter(F.col("l_orderkey") % 4 <= 1),
        lineitem.filter(F.col("l_orderkey") % 4 == 2),
        lineitem.filter(F.col("l_orderkey") % 4 == 3),
    ]
    states = [
        histogram_state(
            b, ["l_returnflag"], "l_extendedprice",
            HIST_LO, HIST_HI, HIST_BINS,
        )
        for b in batches
    ]
    merged = merge_histogram_states(states, ["l_returnflag"])
    return quantile_from_histogram(
        merged, ["l_returnflag"], list(HIST_QS), HIST_LO, HIST_HI, HIST_BINS
    ).orderBy("l_returnflag", "q")


def _hist_quantile_sql() -> str:
    width = (HIST_HI - HIST_LO) / float(HIST_BINS)
    vals = ", ".join(f"({q!r})" for q in HIST_QS)
    return f"""
WITH h AS (
  SELECT l_returnflag,
         CAST(least(greatest(floor(
           (CAST(l_extendedprice AS DOUBLE) - {HIST_LO!r}) / {width!r}
         ), 0), {HIST_BINS - 1}) AS INTEGER) AS bin,
         count(*) AS n
  FROM lineitem
  GROUP BY l_returnflag, 2
),
c AS (
  SELECT *,
         sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(n) OVER (PARTITION BY l_returnflag) AS total
  FROM h
),
qs AS (SELECT q FROM (VALUES {vals}) AS t(q)),
j AS (
  SELECT *, q * CAST(total AS DOUBLE) AS target FROM c, qs
)
SELECT l_returnflag, q,
       round({HIST_LO!r} + {width!r} * (CAST(bin AS DOUBLE)
             + (target - CAST(cum - n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
         AS quantile_est
FROM j
WHERE CAST(cum AS DOUBLE) >= target AND CAST(cum - n AS DOUBLE) < target
ORDER BY l_returnflag, q
"""


QUERIES: dict = {
    "rel_incr_agg_merge": (incr_agg_merge, _INCR_AGG_SQL),
    "rel_zorder_key": (zorder_key_events, _zorder_sql()),
    "rel_snapshot_diff": (snapshot_diff_orders, _SNAPSHOT_DIFF_SQL),
    "rel_interval_coalesce": (interval_coalesce_shipping, _INTERVAL_COALESCE_SQL),
    "rel_skew_report": (skew_report_orders, _SKEW_REPORT_SQL),
    "rel_skew_count_distinct": (skew_count_distinct_parts, _SKEW_CD_SQL),
    "rel_bloom_prune_join": (bloom_prune_join_q, _BLOOM_PRUNE_SQL),
    "rel_join_explosion": (join_explosion_q, _JOIN_EXPLOSION_SQL),
    "rel_hist_quantile_merge": (hist_quantile_merge, _hist_quantile_sql()),
    "rel_dq_audit": (dq_audit_battery, _DQ_AUDIT_SQL),
    "rel_cdc_apply": (cdc_apply_changes, _CDC_APPLY_SQL),
    "rel_q2_min_cost_supplier": (q2, _Q2_SQL),
    "rel_q16_supplier_part_counts": (q16, _Q16_SQL),
    "rel_q20_excess_stock": (q20, _Q20_SQL),
    "rel_q13_order_count_distribution": (q13, _Q13_SQL),
    "rel_q15_top_supplier": (q15, _Q15_SQL),
    "rel_q4_order_priority": (q4, _Q4_SQL),
    "rel_unpivot": (unpivot_part, _UNPIVOT_SQL),
    "rel_merge_upsert": (upsert, _UPSERT_SQL),
    "rel_range_frame_30d": (range_frame, _RANGE_FRAME_SQL),
    "rel_cohort_retention": (cohort_retention, _COHORT_SQL),
    "rel_funnel_view_click": (funnel, _FUNNEL_SQL),
    "rel_division_all_late": (division_all_late, _DIVISION_SQL),
    "rel_try_funcs": (try_funcs, _TRY_FUNCS_SQL),
    "rel_hll_mergeable_rollup": (hll_mergeable_rollup, None),
    "rel_hll_rollup_error": (hll_rollup_error, _HLL_ERROR_SQL),
    "rel_cms_heavy_hitters": (cms_heavy_hitters, None),
    "rel_cms_rollup_error": (cms_rollup_error, _CMS_ERROR_SQL),
    "rel_hypertable_rollup": (hypertable_rollup, _HYPERTABLE_SQL),
    "rel_time_decay_totals": (time_decay_totals, _TIME_DECAY_SQL),
    "rel_variant_extract": (variant_extract, _VARIANT_SQL),
    "rel_null_funcs": (null_funcs, _NULL_FUNCS_SQL),
    "rel_q6_forecast_revenue": (q6, _Q6_SQL),
    "rel_q7_volume_shipping": (q7, _Q7_SQL),
    "rel_q8_market_share": (q8, _Q8_SQL),
    "rel_q10_returned_items": (q10, _Q10_SQL),
    "rel_q14_promo_revenue": (q14, _Q14_SQL),
    "rel_q19_disjunctive": (q19, _Q19_SQL),
    "rel_q22_idle_customers": (q22, _Q22_SQL),
    "rel_window_battery": (window_battery, _WINDOW_BATTERY_SQL),
    "rel_lateral_tokens": (lateral_tokens, _LATERAL_TOKENS_SQL),
    "rel_q17_small_quantity": (q17, _Q17_SQL),
    "rel_value_deciles": (value_deciles, _DECILES_SQL),
    "rel_interval_join": (interval_join_batch, _INTERVAL_JOIN_SQL),
    "rel_asof_click_view": (asof_click_view, _ASOF_SQL),
    "rel_band_join": (quantity_band_join, _BAND_JOIN_SQL),
    "rel_session_window_native": (session_window_native, _SESSION_WINDOW_SQL),
    "rel_approx_stats": (approx_stats, None),
    "rel_exact_distinct_rollup": (exact_distinct_rollup,
                                  _EXACT_DISTINCT_ROLLUP_SQL),
    "rel_exact_percentiles": (exact_percentiles, _EXACT_PCTL_SQL),
    "rel_robust_outliers": (robust_outliers_q, _ROBUST_OUTLIERS_SQL),
    "rel_table_stats": (table_stats_q, _table_stats_sql()),
    "rel_corr_matrix": (corr_matrix_q, _corr_matrix_sql()),
    "rel_chi_square": (chi_square_q, _chi_square_sql()),
    "rel_winsorize": (winsorize_q, _WINSORIZE_SQL),
    "rel_impute_median": (impute_median_q, _IMPUTE_MEDIAN_SQL),
    "rel_array_funcs": (array_funcs, _ARRAY_FUNCS_SQL),
    "rel_map_funcs": (map_funcs, _MAP_FUNCS_SQL),
    "rel_q1_pricing_summary": (q1, _Q1_SQL),
    "rel_q3_shipping_priority": (q3, _Q3_SQL),
    "rel_q5_local_supplier_volume": (q5, _Q5_SQL),
    "rel_q18_large_orders": (q18, _Q18_SQL),
    "rel_top_orders_per_customer": (top_orders, _TOP_ORDERS_SQL),
    "rel_running_total": (running_total, _RUNNING_TOTAL_SQL),
    "rel_sales_rollup": (rollup, _ROLLUP_SQL),
    "rel_sales_cube": (cube, _CUBE_SQL),
    "rel_grouping_sets": (grouping_sets, _GROUPING_SETS_SQL),
    "rel_sales_pivot": (pivot, _PIVOT_SQL),
    "rel_distinct_nations": (distinct_nations, _DISTINCT_NATIONS_SQL),
    "rel_set_ops": (set_ops, _SET_OPS_SQL),
    "rel_events_json_stats": (json_stats, _JSON_STATS_SQL),
    "rel_events_time_buckets": (time_buckets, _TIME_BUCKETS_SQL),
    "rel_date_arithmetic": (date_arithmetic, _DATE_ARITH_SQL),
    "rel_part_string_funcs": (string_funcs, _STRING_FUNCS_SQL),
    "rel_lineitem_math_funcs": (math_funcs, _MATH_FUNCS_SQL),
    "rel_join_flavors": (join_flavors, _JOIN_FLAVORS_SQL),
    "rel_sessionize": (sessionize, _SESSIONIZE_SQL),
    "rel_assoc_rules": (association_rules_q, _ASSOC_RULES_SQL),
    "rel_event_transitions": (event_transitions_q, _EVENT_TRANSITIONS_SQL),
    "rel_scd2_intervals": (scd2, _SCD2_SQL),
    "rel_scd2_upsert": (scd2_upsert, _SCD2_SQL),
    "rel_scd2_lookup": (scd2_lookup_q, _SCD2_LOOKUP_SQL),
    "rel_funnel_timeout": (funnel_timeout_q, _FUNNEL_TIMEOUT_SQL),
    "rel_funnel_times": (funnel_times_q, _FUNNEL_TIMES_SQL),
    "rel_dau_mau": (dau_mau_q, _DAU_MAU_SQL),
    "rel_twap": (twap_q, _TWAP_SQL),
    "rel_gap_fill": (gap_fill, _GAP_FILL_SQL),
    "rel_tumbling_hour": (tumbling, _TUMBLING_SQL),
    "rel_sliding_10min": (sliding, _SLIDING_SQL),
    "rel_q9_product_profit": (q9, _Q9_SQL),
    "rel_q11_important_parts": (q11, _Q11_SQL),
    "rel_q12_lateness_priority": (q12, _Q12_SQL),
    "rel_q21_waiting_suppliers": (q21, _Q21_SQL),
}
