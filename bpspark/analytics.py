"""Composed analytical queries — multi-operator plans in the TPC-H style,
adapted to the testdata schema (TESTDATA.md). These are the "real user
query" tier above the single-operator inventory: each composes scans,
broadcast + shuffle joins, aggregation, window, and top-k in one plan and
is fully oracle-checked.

Scale notes: every query keeps dims broadcast, facts shuffled at most once
on their join key, and aggregates partial-first. These are the shapes a
1000-executor cluster runs all day."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bpspark.io import table
from bpspark.registry import op


@op(
    "q_shipping_priority",
    sql="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 20
    """,
)
def q_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers (broadcast) × orders ×
    lineitem, revenue per order, top-20. The customer filter runs before
    the join, so the broadcast side is small; lineitem shuffles once."""
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(20)
    )


@op(
    "q_nation_revenue",
    sql="""
    SELECT n_name AS nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def q_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region — a 5-table star
    with every dim broadcast; only orders×lineitem shuffles."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@op(
    "q_top_parts_per_brand",
    sql="""
    SELECT p_brand, p_partkey, part_revenue FROM (
        SELECT p_brand, p_partkey,
               ROUND(SUM(l_extendedprice), 2) AS part_revenue,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand ORDER BY ROUND(SUM(l_extendedprice), 2) DESC, p_partkey
               ) AS rn
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    ) WHERE rn <= 3
    """,
)
def q_top_parts_per_brand(spark: SparkSession, sf: str) -> DataFrame:
    """Agg → window top-k composition: top-3 revenue parts per brand.
    The aggregate shrinks the data before the window shuffle."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("part_revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("part_revenue").desc(), F.col("p_partkey"))
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "part_revenue")
    )


@op(
    "q_hypertable_rollup",
    sql="""
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts) AS day_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(SUM(value), 2) / COUNT(*) AS avg_value
    FROM events
    GROUP BY ROLLUP (event_type, time_bucket(INTERVAL '1 day', ts))
    """,
)
def q_hypertable_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per-(type, day) metrics
    with subtotals per type and a grand total in one Expand+aggregate pass.
    The partitioned-by-time layout this models is exactly how the events
    table would be stored at 100 TB (partition pruning on day)."""
    e = table(spark, sf, "events")
    day = F.date_trunc("day", "ts").alias("day_start")
    return (
        e.select("event_type", day, "value")
        .rollup("event_type", "day_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
        )
    )


@op(
    "q_order_fulfillment_funnel",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS pipeline_value,
           COUNT(*) FILTER (WHERE shipped_lines = total_lines) AS fully_shipped
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               COUNT(*) AS total_lines,
               COUNT(*) FILTER (WHERE l_shipdate <= TIMESTAMP '1999-01-01') AS shipped_lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderstatus, o_totalprice
    )
    GROUP BY o_orderstatus
    """,
)
def q_order_fulfillment_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Two-level aggregation funnel: per-order line counts, then per-status
    rollup with conditional aggregates — the reference's workflow-status
    reporting shape (R14 control table analytics) at query scale."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("total_lines"),
            F.count(F.when(F.col("l_shipdate") <= cutoff, 1)).alias("shipped_lines"),
        )
    )
    return per_order.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("pipeline_value"),
        F.count(F.when(F.col("shipped_lines") == F.col("total_lines"), 1)).alias("fully_shipped"),
    )


@op(
    "agg_corr_regr",
    sql="""
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
               AS corr_xy,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS regr_slope_yx,
           (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n
               AS regr_intercept_yx
    FROM (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               ROUND(SUM(l_discount), 2) AS sx,
               ROUND(SUM(l_tax), 2) AS sy,
               ROUND(SUM(l_discount * l_discount), 4) AS sxx,
               ROUND(SUM(l_tax * l_tax), 4) AS syy,
               ROUND(SUM(l_discount * l_tax), 4) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def agg_corr_regr(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation + simple linear regression (corr / regr_slope /
    regr_intercept family) via stabilized moments, per group.

    Native corr()/regr_*() differ across engines in the last ulps
    (accumulation order), so the cross-engine-exact form snaps the exact-2dp
    moment sums with ROUND (the agg_stddev_stable trick: l_discount and
    l_tax are small-magnitude exact-decimal columns, so Σx, Σx², Σxy are
    exactly representable after rounding) and then evaluates the SAME
    IEEE-deterministic expression tree in both engines. One shuffle,
    partial-aggregated map-side — the moments are plain SUMs, so this holds
    at 100 TB exactly like any groupBy-sum."""
    li = table(spark, sf, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("l_discount"), 2).alias("sx"),
        F.round(F.sum("l_tax"), 2).alias("sy"),
        F.round(F.sum(F.col("l_discount") * F.col("l_discount")), 4).alias("sxx"),
        F.round(F.sum(F.col("l_tax") * F.col("l_tax")), 4).alias("syy"),
        F.round(F.sum(F.col("l_discount") * F.col("l_tax")), 4).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = sxy - sx * sy / n
    var_x = sxx - sx * sx / n
    var_y = syy - sy * sy / n
    slope = cov_n / var_x
    return moments.select(
        "l_returnflag",
        "n",
        (cov_n / F.sqrt(var_x * var_y)).alias("corr_xy"),
        slope.alias("regr_slope_yx"),
        ((sy - slope * sx) / n).alias("regr_intercept_yx"),
    )
