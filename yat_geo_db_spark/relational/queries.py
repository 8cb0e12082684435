"""TPC-H-style relational operators as DataFrame pipelines.

Cross-engine determinism notes (these queries are hash-compared against a
DuckDB oracle):

- Sums of doubles are order-dependent; we round each row's value to a
  fixed-point integer (floor(x*10^s + 0.5), pure IEEE ops both engines run
  identically) and sum exactly as DECIMAL(38,0). Exact and associative, so
  results match bit-for-bit and don't drift with partitioning — the right
  engineering at 100 TB, and ~free per row (no BigDecimal in the hot loop).
- Averages are computed as exact-sum / count, then rounded.
- Every top-k orders by (rounded measure, unique key) so ties are stable.
- Timestamps are emitted as 'yyyy-MM-dd' strings (session TZ pinned to UTC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def _scaled_long(col: Column, scale: int) -> Column:
    """Round a double to `scale` places as a fixed-point integer using only
    IEEE-754 ops (multiply, add, floor) that every engine executes
    identically — so cross-engine parity holds by construction.

    Deliberately NOT ``cast(decimal(30,s))``: the per-row double→decimal cast
    goes through BigDecimal.setScale (divide-and-round) in the JVM — the one
    hot-loop allocation in an otherwise codegen'd aggregate, and the first
    decimal-heavy query after a Python-runner class-load pays a huge JIT
    deopt penalty re-interpreting it. floor() is a single native op."""
    m = float(10 ** scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)).cast("decimal(38,0)")


def dsum(col: Column, scale: int = 4) -> Column:
    """Exact, engine-portable sum of a double column via fixed-point longs.

    Per row: ``floor(x*10^s + 0.5)`` (pure IEEE, identical in Spark and
    DuckDB), accumulated as DECIMAL(38,0) — long-backed compact adds, no
    overflow at any scale factor — then one decimal→double cast and one
    double division at the end. Associative and partition-order-independent,
    so results don't drift when partitioning changes (the 100 TB property),
    and the DuckDB oracle mirror (queries.relational_queries._dsum) computes
    bit-identical values."""
    m = float(10 ** scale)
    return F.sum(_scaled_long(col, scale)).cast("double") / F.lit(m)


def dsum_over(col: Column, window, scale: int = 4) -> Column:
    """Windowed variant of dsum (exact running/frame sums)."""
    m = float(10 ** scale)
    return F.sum(_scaled_long(col, scale)).over(window).cast("double") / F.lit(m)


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filtered aggregation. One shuffle on the
    4-value group key; partial aggregation (map-side combine) does nearly all
    the work — the plan must show HashAggregate(partial)→Exchange→HashAggregate."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 8).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("count_order"), 6).alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         cutoff: str = "1998-03-15") -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k. `customer`
    is the small side → broadcast; lineitem join shuffles on orderkey."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(region: DataFrame, nation: DataFrame,
                             customer: DataFrame, orders: DataFrame,
                             lineitem: DataFrame, supplier: DataFrame,
                             region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: snowflake join with a same-nation constraint.
    region/nation/supplier are broadcast dims; the orders↔lineitem join is
    the only big shuffle."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q18_large_orders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, threshold: float = 200.0) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregation feeding a join. The
    big aggregate (sum per orderkey) shuffles once; its survivors are few
    → Catalyst/AQE turn the orders join into a broadcast at runtime."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > threshold)       # HAVING
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window ranking: row_number per customer by totalprice. One shuffle on
    o_custkey; no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def customer_running_total(orders: DataFrame) -> DataFrame:
    """Window frame: running sum of order value per customer in date order.
    Fixed-point accumulation keeps the running values engine-exact."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        dsum_over(F.col("o_totalprice"), w, 2).alias("running_total"),
    )


def sales_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP aggregation over (year, status) with grand total."""
    return (
        orders.rollup(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_sales"),
        )
        .orderBy(F.asc_nulls_first("order_year"), F.asc_nulls_first("o_orderstatus"))
    )


def sales_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (year, status): all four grouping combinations."""
    return (
        orders.cube(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_sales"),
        )
    )


def q4_order_priority(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join. Orders
    in a date window counted per priority when at least one line item
    shipped late (l_shipdate > o_orderdate here — the fixture lacks
    commit/receipt dates; same plan shape). The semi join never duplicates
    or widens rows — at scale it shuffles only the join keys' columns."""
    late = F.col("l_shipdate") > F.col("o_orderdate")
    window = (F.col("o_orderdate") >= F.lit("1995-01-01")) & (
        F.col("o_orderdate") < F.lit("1995-07-01")
    )
    return (
        orders.filter(window)
        .join(
            lineitem.select("l_orderkey", "l_shipdate"),
            (F.col("o_orderkey") == F.col("l_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — revenue from line items
    whose quantity is below 20% of that part's average quantity.

    Decorrelated Spark-first into groupBy(l_partkey) + join (the same
    rewrite Catalyst applies to correlated scalar subqueries, written
    explicitly so the plan is inspectable): one shuffle for the per-part
    averages, the brand dimension broadcast. The threshold average is
    exact-sum/count (dsum) so both engines compute the identical double and
    the `<` comparison never straddles an ulp."""
    thresholds = lineitem.groupBy("l_partkey").agg(
        (F.lit(0.2) * dsum(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias(
            "qty_threshold"
        )
    )
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    return (
        lineitem.join(
            F.broadcast(brand_parts),
            lineitem["l_partkey"] == brand_parts["p_partkey"],
        )
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(dsum(F.col("l_extendedprice"), 2) / F.lit(7.0), 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def order_value_deciles(orders: DataFrame) -> DataFrame:
    """Distribution windows: ntile(10) of order value WITHIN each order
    year. Partitioning by year keeps the sort distributed — a
    global ntile would funnel every row through one partition, the classic
    window-function scale trap; per-partition distribution stats are the
    100 TB-safe form."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("order_year")).orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    yearly = orders.select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderkey",
        "o_totalprice",
    ).withColumn("decile", F.ntile(10).over(w))
    return yearly.groupBy("order_year", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice"), 2).alias("decile_total"),
    )


def sales_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((year), (status), ()) — the asymmetric subset
    CUBE/ROLLUP can't express. Uses the Spark 4 DataFrame groupingSets
    API, not a session temp view: createOrReplaceTempView on a fixed
    name mutates the SHARED catalog, and two concurrent callers would
    silently compute over each other's input."""
    year = F.year("o_orderdate").cast("int").alias("order_year")
    base = orders.select(year, "o_orderstatus", "o_totalprice")
    return (
        base.groupingSets(
            [["order_year"], ["o_orderstatus"], []],
            "order_year", "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_sales"),
        )
        .select("order_year", "o_orderstatus", "n_orders", "total_sales")
    )


def sales_pivot(orders: DataFrame) -> DataFrame:
    """Pivot order status into columns (explicit value list keeps the output
    schema static — required for both Catalyst planning and oracle parity)."""
    out = (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice"), 2))
    )
    return out.select(
        "order_year",
        F.col("F").alias("sales_f"),
        F.col("O").alias("sales_o"),
        F.col("P").alias("sales_p"),
    )


def segment_distinct_nations(customer: DataFrame) -> DataFrame:
    """Exact distinct aggregation (count-distinct expands to a two-phase
    aggregate — at 100 TB prefer approx_count_distinct for sketches; exact
    kept here because the oracle must match)."""
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


def segment_set_ops(customer: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT coverage in one result: per-op row counts
    over customer key sets (deterministic scalar outputs).

    Lazy single-pass form: `c_custkey` is the table's primary key, so the
    three set-op cardinalities are conditional counts over per-row membership
    flags — one scan with map-side partial aggregation and a 1-row final
    exchange, instead of three full-table distinct/except shuffles driven by
    eager `.count()` actions at call time. At 100 TB that is 1 pass, not 3,
    and the work happens when the caller materializes, not when the query is
    built."""
    is_rich = F.col("c_acctbal") > 5000
    is_seg = F.col("c_mktsegment") == "MACHINERY"
    agg = customer.agg(
        F.count(F.when(is_rich | is_seg, 1)).alias("n_union"),
        F.count(F.when(is_rich & is_seg, 1)).alias("n_intersect"),
        F.count(F.when(is_rich & ~is_seg, 1)).alias("n_except"),
    )
    return agg.select(
        F.explode(
            F.create_map(
                F.lit("union"), F.col("n_union"),
                F.lit("intersect"), F.col("n_intersect"),
                F.lit("except"), F.col("n_except"),
            )
        ).alias("op", "n_keys")
    )


def events_json_stats(events: DataFrame) -> DataFrame:
    """JSON extraction (`props` payload) + aggregation per event_type."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            dsum(F.col("value"), 2).alias("sum_value"),
            F.round(dsum(F.col("value"), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


def events_time_buckets(events: DataFrame) -> DataFrame:
    """Date/time function coverage: calendar breakdown + per-hour counts."""
    return (
        events.groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("v"))
        .orderBy("y", "m", "d", "h")
    )


def part_string_funcs(part: DataFrame) -> DataFrame:
    """String function coverage over `part`."""
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.size(F.split("p_type", " ")).alias("type_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


def lineitem_math_funcs(lineitem: DataFrame) -> DataFrame:
    """Math function coverage (abs/ceil/floor/round/pow/sqrt/ln)."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amount"),
        F.round(F.pow(F.col("l_quantity"), 2), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
    )


def order_join_flavors(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi/anti/outer join coverage in one deterministic summary.

    Lazy single-pass form: one left join of (unique) customer keys against
    the distinct big-order key set, then conditional counts — semi = rows
    with a match, anti = rows without, left_null = the outer-join-then-
    IS NULL phrasing of anti (kept as its own row because it exercises the
    outer-join path in the oracle). One join + a 1-row aggregate instead of
    three eager `.count()` actions each re-scanning both tables."""
    big = (
        orders.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey"))
        .distinct()
    )
    joined = customer.select("c_custkey").join(
        big, customer["c_custkey"] == big["o_custkey"], "left"
    )
    agg = joined.agg(
        F.count(F.when(F.col("o_custkey").isNotNull(), 1)).alias("n_semi"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_anti"),
    )
    return agg.select(
        F.explode(
            F.create_map(
                F.lit("semi"), F.col("n_semi"),
                F.lit("anti"), F.col("n_anti"),
                F.lit("left_null"), F.col("n_anti"),
            )
        ).alias("op", "n")
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown showcase — a filtered
    single-group aggregate with zero joins. All three range predicates reach
    the parquet scan (PushedFilters), ReadSchema is the 4 consumed columns,
    and the single-row result needs one tiny final exchange after map-side
    partial aggregation. At 100 TB this is a scan-bound query — the plan has
    nothing else in it."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q7_volume_shipping(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, supplier: DataFrame,
                       nation: DataFrame, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume. The nation
    dim joins twice under different roles (supplier side / customer side) —
    both broadcast — with a disjunctive pair predicate applied after; the
    only big shuffles are lineitem↔orders and ↔customer."""
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
        | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    )
    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
            .alias("revenue")
        )
    )


def q8_market_share(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    nation: DataFrame, region: DataFrame, part: DataFrame,
                    region_name: str = "AMERICA",
                    share_nation: str = "NATION_2",
                    part_type: str = "PROMO") -> DataFrame:
    """TPC-H Q8 shape: market share — a conditional-sum ratio per year.
    part is pre-filtered then broadcast (the classic selective-dim
    broadcast); the share divides two fixed-point-exact sums, so the double
    ratio is bit-identical across engines."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem
        .join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name)
                .select(F.col("r_regionkey").alias("c_rk2"))
            ),
            F.col("c_rk") == F.col("c_rk2"),
        )
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.when(F.col("supp_nation") == share_nation, vol)
                 .otherwise(F.lit(0.0)), 6).alias("share_vol"),
            dsum(vol, 6).alias("total_vol"),
        )
        .select(
            "o_year",
            F.round(F.col("share_vol") / F.col("total_vol"), 6).alias("mkt_share"),
            "total_vol",
        )
    )


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. The returnflag + date filters push to the scans; nation
    broadcasts; the final top-20 is TakeOrderedAndProject (no global sort)."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue percentage for one month — a
    conditional-sum ratio over a selective date slice, part broadcast.
    Single-row output; the ratio divides two exact sums."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)), 6)
            .alias("promo_rev"),
            dsum(disc, 6).alias("total_rev"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6)
            .alias("promo_pct"),
            "total_rev",
        )
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides
    (brand × size-band × quantity-band triples). Catalyst extracts the
    common l_partkey equi-key so this stays a hash join (not a nested
    loop), with the disjunction evaluated as a post-join filter; the
    part-side brand/size disjunction is pushable to the part scan."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    triple = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(triple)
        .agg(
            dsum(disc, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q22_idle_customers(customer: DataFrame, orders: DataFrame,
                       n_codes: int = 7,
                       idle_since: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the global average
    balance with no order since `idle_since`, bucketed by a synthetic
    "country code" (c_custkey % n_codes — the fixture has no phone column).
    The average is a broadcast scalar (exact sum / count → bit-identical
    double in both engines); no-recent-order is a left-anti join whose date
    filter pushes into the orders scan. (TPC-H's literal "never ordered" is
    vacuous on this fixture — every customer has orders — so idleness is
    recency-based; the plan shape is identical.)"""
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        customer
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit(idle_since))
            .select("o_custkey")
            .distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_custkey") % n_codes).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def order_window_battery(orders: DataFrame) -> DataFrame:
    """Analytic-window coverage in one pass: lag/lead, first_value,
    dense_rank, percent_rank, cume_dist — two window specs, both partitioned
    by o_custkey (ONE hash exchange feeds both sorts; Catalyst groups the
    same-partition windows). Every ORDER BY carries the unique o_orderkey
    tiebreak so rank-family outputs are deterministic."""
    from pyspark.sql.window import Window

    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w_time), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w_time), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w_time), 2).alias("first_price"),
        F.dense_rank().over(w_price).alias("price_rank"),
        F.round(F.percent_rank().over(w_price), 6).alias("price_pctrank"),
        F.round(F.cume_dist().over(w_price), 6).alias("price_cumedist"),
    )


def q13_order_count_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape (adapted to the reduced schema — no o_comment
    filter): histogram of per-customer order counts, INCLUDING zero-order
    customers (the left join is the point of the query).

    Aggregation-of-aggregation: left join → per-customer count → per-count
    count. Two shuffles, both map-side combinable; the second aggregates a
    customer-cardinality input down to a handful of histogram rows."""
    per_cust = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(
    lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier over a 3-month shipping
    window, return the supplier(s) achieving the MAX revenue (scalar
    subquery against an aggregate; ties kept, per spec).

    The max is a GLOBAL WINDOW over the revenue aggregate, not a scalar-
    subquery self-join: the self-join form re-executes the whole
    lineitem scan+aggregate on both sides (Catalyst does not reuse the
    exchange across the subquery boundary — observed in the final AQE
    plan), while the window form scans lineitem ONCE and funnels only the
    supplier-cardinality aggregate through a single-partition window —
    rows there are #suppliers, orders of magnitude below #lineitems, the
    classical Q15 trade. Asserted in test_plan_shapes."""
    from pyspark.sql import Window

    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("total_revenue")
        )
    )
    w = Window.partitionBy()
    return (
        revenue.withColumn("max_revenue", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, revenue["l_suppkey"] == supplier["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q9_product_profit(lineitem: DataFrame, orders: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      part: DataFrame, name_frag: str = "red") -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for parts
    matching a name fragment. The fixture has no partsupp table, so unit
    cost is proxied by 0.6 × p_retailprice (same expression arity and join
    shape; documented divergence — TESTDATA.md ships no ps_supplycost).

    Plan: the name-filtered part dim is broadcast into the lineitem scan
    (most selective first), supplier+nation broadcast, orders is the one
    big shuffle join; year extraction happens pre-aggregation so the
    group key is (nation, int)."""
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_name").contains(name_frag))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, 4).alias("sum_profit"))
    )


def q11_important_parts(lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame, nation_name: str = "NATION_1",
                        fraction: float = 0.001) -> DataFrame:
    """TPC-H Q11 shape: groupBy + HAVING against a scalar aggregate over
    the same relation (parts whose revenue from one nation's suppliers
    exceeds `fraction` of that nation's total). partsupp is absent from
    the fixture, so "value" is lineitem revenue restricted to the nation's
    suppliers — identical decorrelation problem and plan shape.

    Spark-first: the scalar total is a global-window max-style aggregate
    over the grouped result (one extra exchange of #parts rows), NOT a
    scalar-subquery self-join that would scan lineitem twice — the same
    rewrite as q15_top_supplier."""
    from pyspark.sql import Window

    nat_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    # keep the SCALED DECIMAL sum alongside the double: the global window
    # total must be summed in exact fixed-point (decimal adds are
    # associative; a double window-sum would drift with partition order)
    per_part = (
        lineitem.join(F.broadcast(nat_supp),
                      F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _scaled_long(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                )
            ).alias("pv_scaled")
        )
    )
    w = Window.partitionBy()
    m = F.lit(1e4)
    return (
        per_part.withColumn("tv_scaled", F.sum("pv_scaled").over(w))
        .filter(
            F.col("pv_scaled").cast("double")
            > F.lit(fraction) * F.col("tv_scaled").cast("double")
        )
        .select(
            "l_partkey",
            (F.col("pv_scaled").cast("double") / m).alias("part_value"),
            (F.col("tv_scaled").cast("double") / m).alias("total_value"),
        )
    )


def q12_shipmode_priority(lineitem: DataFrame, orders: DataFrame,
                          late_days: int = 60) -> DataFrame:
    """TPC-H Q12 shape: two conditional counts per category over a joined
    date-window slice. The fixture has no l_shipmode/commitdate/receiptdate,
    so the category is the lateness band (shipped ≤/> `late_days` after
    order) and the counted split is urgent vs non-urgent priority — same
    two-way conditional aggregation over the lineitem⋈orders join, with the
    ship-date window pushed into the lineitem scan."""
    lateness = F.when(
        F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(late_days),
                                              F.col("o_orderdate")),
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(lateness.alias("lateness"))
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


def q21_waiting_suppliers(lineitem: DataFrame, orders: DataFrame,
                          supplier: DataFrame, nation: DataFrame,
                          nation_name: str = "NATION_1",
                          late_days: int = 90, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — an EXISTS (another supplier on the order) plus a
    NOT EXISTS (another LATE supplier on the order), both correlated on
    (orderkey, ≠ suppkey). Lateness = shipped > `late_days` after the order
    date (fixture has no commit/receipt dates; same correlation shape).

    Spark-first decorrelation: ONE aggregate per (order, supplier) row
    (did this supplier ship late), then the per-order supplier counts ride
    a window over the SAME rows — the lineitem⋈orders subtree is scanned
    once (a separate per-order groupBy joined back would scan it twice),
    and both the aggregate and the window shuffle on the narrow
    (l_orderkey[, l_suppkey]) keys. No correlated self-join, no O(N²)."""
    from pyspark.sql import Window

    late = F.col("l_shipdate") > F.timestamp_add(
        "DAY", F.lit(late_days), F.col("o_orderdate")
    )
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    # per (order, supplier): did THIS supplier ship late; then per order,
    # supplier / late-supplier counts as window aggregates over those rows
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("me_late")
    )
    w_o = Window.partitionBy("l_orderkey")
    waiting = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w_o))
        .withColumn("n_late_supp", F.sum("me_late").over(w_o))
        .filter(
            (F.col("me_late") == 1)
            & (F.col("n_supp") > 1)          # EXISTS another supplier
            & (F.col("n_late_supp") == 1)    # NOT EXISTS another late one
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waiting.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation.filter(F.col("n_name") == nation_name)),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(k)
    )


def gap_fill_hourly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key hourly time series with gaps made explicit and
    forward-filled — the time-series-warehouse densification op (a
    downstream ML join needs a row per hour, not a row per event).

    Steps: per-(key, hour) exact-fixed-point sums → per-key hour SPINE
    via sequence(min_hour, max_hour) (each key densifies only its own
    active span, so spine size is bounded by key lifetime, not global
    range) → left join observations onto the spine (equi-join on
    (key, hour)) → last(ignorenulls) window forward-fills. One shuffle
    on the key carries the window AND the join; the first bucket per
    key is observed by construction, so filled_value is never null.
    Returns (key, hour_bucket, value — null on gaps, filled_value,
    is_gap)."""
    from pyspark.sql import Window

    hour = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(3_600_000_000)
    ).cast("long")
    obs = events.groupBy(
        F.col(key_col), hour.alias("h")
    ).agg(dsum(F.col(value_col), 2).alias("v"))
    span = obs.groupBy(key_col).agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = span.select(
        key_col, F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("h")
    )
    j = spine.join(obs, [key_col, "h"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col(key_col),
        F.col("h").alias("hour_bucket"),
        F.col("v").alias("value"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNull().alias("is_gap"),
    )


# --------------------------------------------------------------------------
# TPC-H q2/q16/q20 — the partsupp trio. The driver fixture ships no
# partsupp relation, so one is SYNTHESIZED deterministically from
# part × supplier with integer arithmetic only: Spark and the DuckDB
# oracle CTE derive bit-identical rows at every scale factor, closing the
# last three TPC-H shapes (COVERAGE.md §2.7 note).
# --------------------------------------------------------------------------

PARTSUPP_PER_PART = 4


def synth_partsupp(part: DataFrame, supplier: DataFrame,
                   n_per_part: int = PARTSUPP_PER_PART) -> DataFrame:
    """Deterministic partsupp: each part gets `n_per_part` suppliers
    chosen by dense supplier index (p_partkey*7 + i*13) mod n_supp —
    index, not raw suppkey, so no contiguity assumption — with availqty
    and supplycost from integer congruences (supplycost is exact cents
    over 100: the double is identical in both engines, so Q2's
    cost-equality join is safe).

    Plan shape: supplier is dim-sized (its count and dense index come
    from one tiny single-partition window, broadcast); the output is
    part-partitioned — n_per_part rows per part, no shuffle of the part
    table beyond the projection. At 100 TB-scale part counts this stays
    a map-side generate + two broadcast joins."""
    from pyspark.sql import Window

    sidx = supplier.select(
        F.col("s_suppkey"),
        (F.row_number().over(Window.orderBy(F.asc("s_suppkey"))) - 1).alias(
            "idx"
        ),
    )
    nsup = sidx.agg(F.count(F.lit(1)).alias("n_supp"))
    exploded = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(nsup))
        .select(
            "p_partkey",
            "n_supp",
            F.explode(
                F.array(*[F.lit(i) for i in range(n_per_part)])
            ).alias("i"),
        )
        .select(
            "p_partkey",
            ((F.col("p_partkey") * 7 + F.col("i") * 13) % F.col("n_supp"))
            .alias("idx"),
            ((F.col("p_partkey") * 31 + F.col("i") * 17) % 9999 + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                ((F.col("p_partkey") * 997 + F.col("i") * 131) % 99900 + 100)
                .cast("double")
                / F.lit(100.0)
            ).alias("ps_supplycost"),
        )
    )
    return exploded.join(F.broadcast(sidx), "idx").select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        "ps_availqty",
        "ps_supplycost",
    )


def q2_min_cost_supplier(
    part: DataFrame, supplier: DataFrame, nation: DataFrame,
    region: DataFrame, partsupp: DataFrame,
    region_name: str = "EUROPE", min_size: int = 15,
    type_suffix: str = "D",
) -> DataFrame:
    """TPC-H Q2 shape: for qualifying parts, the supplier(s) achieving
    the MINIMUM supplycost among suppliers of one region (correlated
    min-subquery; ties kept, per spec).

    Decorrelated to a per-part window min over the region-eligible
    partsupp rows — the correlated-subquery form would re-execute the
    partsupp⋈supplier⋈nation⋈region tree on both sides. All three dims
    broadcast; the only shuffle is the window partition on ps_partkey,
    and the part filter prunes BEFORE the window via the join. Returns
    (s_acctbal, s_name, n_name, p_partkey, p_type, supplycost), top 100
    by acctbal desc."""
    from pyspark.sql import Window

    eligible = (
        partsupp.join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal",
                                        "s_nationkey")),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    qual = eligible.join(
        F.broadcast(
            part.filter(
                (F.col("p_size") >= min_size)
                & F.col("p_type").like(f"%{type_suffix}")
            ).select("p_partkey", "p_type")
        ),
        F.col("ps_partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("ps_partkey")
    return (
        qual.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q16_supplier_part_counts(
    part: DataFrame, supplier: DataFrame, partsupp: DataFrame,
    excl_brand: str = "Brand#4", excl_type_prefix: str = "PRO",
    sizes: tuple[int, ...] = (1, 5, 10, 15, 20, 25, 30, 35),
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT-LIKE part exclusion and a NOT-IN supplier exclusion (the
    fixture has no s_comment, so 'complaints' suppliers are proxied by
    s_acctbal < 0 — same anti-join shape).

    Plan: both exclusions broadcast (complaints is a handful of rows, the
    filtered part dim is dim-sized); the distinct-count shuffles once on
    the 3-column group key. Returns (p_brand, p_type, p_size,
    supplier_cnt) ordered cnt desc."""
    complaints = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    kept_parts = part.filter(
        (F.col("p_brand") != excl_brand)
        & ~F.col("p_type").startswith(excl_type_prefix)
        & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        partsupp.join(F.broadcast(complaints), "ps_suppkey", "left_anti")
        .join(
            F.broadcast(kept_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def q20_excess_stock(
    part: DataFrame, supplier: DataFrame, nation: DataFrame,
    region: DataFrame, partsupp: DataFrame, lineitem: DataFrame,
    name_prefix: str = "red", region_name: str = "ASIA",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region holding EXCESS STOCK of
    name-matched parts — ps_availqty > 50% of the quantity they shipped
    of that part in one year (correlated sum-subquery; pairs with no
    shipments drop out, per the spec's NULL-comparison semantics → the
    decorrelated form is an INNER join on the aggregated pairs).

    Plan: lineitem aggregates once on (partkey, suppkey) after the
    pushed date filter — the only big shuffle; the name-filtered part
    set is a broadcast semi-join; the qualifying suppkey set and the
    region nation keys are broadcast semi-joins into the supplier dim.
    dsum keeps the shipped-quantity sum partition-order-exact. Returns
    (s_name, s_acctbal) ordered by name."""
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * dsum(F.col("l_quantity"), 2)).alias("half_qty"))
    )
    qualifying = (
        partsupp.join(
            F.broadcast(
                part.filter(F.col("p_name").startswith(name_prefix)).select(
                    "p_partkey"
                )
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    region_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        supplier.join(
            qualifying,
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(region_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (current, next) event-type pair, the transition count and
    P(next | current) — the journey-mining read behind funnel design and
    next-event prediction. Ties on timestamp break by event id so the
    sequence (and therefore the matrix) is deterministic.

    Scale shape: ONE user-keyed shuffle for the lead() sequence window
    (partition-local sort), a map-side-combinable groupBy on the
    (current, next) pair — cardinality |types|², tiny — and the per-row
    denominator comes from a window over that tiny aggregate. The raw
    event stream is touched exactly once."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("cur_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = Window.partitionBy("cur_type")
    return pairs.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wc), 6).alias("p_next"),
    )


def association_rules(
    events: DataFrame,
    gap_minutes: int = 15,
    min_pair_n: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Directional association rules over session baskets (market-basket
    mining on the event stream): for each ordered pair of event types
    co-occurring in a session, support = n_ab/N_sessions, confidence =
    n_ab/n_a, lift = confidence/(n_b/N). Lift > 1 means "sessions with a
    see b more than base rate" — the next-action/recommendation read the
    transition matrix (strictly sequential) can't give.

    Scale shape: one user-keyed shuffle to assign sessions
    (streaming.windows.assign_sessions), a distinct over (session, type)
    baskets, an equi self-join on the session key (per-session fan-out
    bounded by the type count, not the event count), a map-side
    combinable pair aggregate, and broadcast joins of the |types|-row
    marginals. All counts integer ⇒ the ratio arithmetic is engine-exact;
    min_pair_n prunes noise rules; top_k = TakeOrdered on (lift desc,
    antecedent, consequent)."""
    from yat_geo_db_spark.streaming.windows import assign_sessions

    # baskets feed FOUR subtrees (both self-join sides, item marginals,
    # session total) — persist+materialize like every shared band table
    # (ReusedExchange can't dedup aliased sides; see ngram_jaccard_pairs)
    baskets = (
        assign_sessions(events, gap_minutes)
        .select("user_id", "session_id", "event_type")
        .distinct()
        .persist()
    )
    baskets.count()
    n_sessions_frame = F.broadcast(
        baskets.select("user_id", "session_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("_ns"))
    )
    item_counts = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n_item")
    )
    a = baskets.select(
        "user_id", "session_id", F.col("event_type").alias("antecedent")
    )
    b = baskets.select(
        "user_id", "session_id", F.col("event_type").alias("consequent")
    )
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_n)
    )
    enriched = (
        pairs.join(
            F.broadcast(
                item_counts.select(
                    F.col("event_type").alias("antecedent"),
                    F.col("_n_item").alias("_n_a"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("event_type").alias("consequent"),
                    F.col("_n_item").alias("_n_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(n_sessions_frame)
    )
    conf = F.col("n_ab") / F.col("_n_a")
    base = F.col("_n_b") / F.col("_ns")
    out = enriched.select(
        "antecedent",
        "consequent",
        "n_ab",
        F.round(F.col("n_ab") / F.col("_ns"), 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(conf / base, 6).alias("lift"),
    )
    return out.orderBy(
        F.desc("lift"), "antecedent", "consequent"
    ).limit(top_k)


def dau_mau_stickiness(
    events: DataFrame,
    window_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily active users, trailing-window active users (MAU for
    window_days=30), and the DAU/MAU stickiness ratio per day — the
    engagement read every product dashboard opens with. Exact, not
    sketched: the trailing distinct comes from exploding each DISTINCT
    (day, user) pair onto the window_days target days it supports, then
    one count_distinct per target day — O(active-pairs × window) rows,
    bounded by the DAILY-distinct table (tiny next to raw events),
    never a per-day rescan or a range self-join of the event log.
    Only days observed in the data are reported."""
    pairs = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("u"),
    ).distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = pairs.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("_off"),
        "day",
        "u",
    ).select(F.date_add(F.col("day"), F.col("_off")).alias("day"), "u")
    mau = spread.groupBy("day").agg(F.count_distinct("u").alias("wau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            F.col("wau").alias("window_active"),
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )
