"""TPC-H-derived decision-support suite over the synthetic testdata.

The reference module has no relational surface (it is a 3-class Alfresco
ingestion job — SURVEY §2.2); this suite is part of the declared engine
capability closure (SURVEY §2.3/§2.4): the canonical multi-join /
aggregate / top-k decision-support shapes every warehouse engine is
measured by, expressed Spark-first and oracle-checked against DuckDB
running the same SQL on the same parquet.

Adaptations to the testdata schema (TESTDATA.md — no partsupp table; no
o_shippriority / l_shipmode / l_commitdate / l_receiptdate / p_container
/ c_address columns) are named per-query; predicates use this corpus's
actual value domains (dates 1995-2001, p_type single-word, nations
NATION_0..24).

Cross-engine float discipline (verify-skill cookbook): money sums are
ROUND(SUM(expr), 2) on both sides; averages are rounded-sum / count
(never ROUND(AVG)); ratios divide two rounded sums; every ORDER BY ...
LIMIT has a total (tie-free) sort key; no DateType in outputs.

Scale posture: nation/region are broadcast everywhere (25 / 5 rows at
any SF); filtered dimension subsets (brand-filtered part, one-segment
customer) are broadcast AFTER the filter so only the surviving rows
ship; fact-fact joins shuffle once on the join key with AQE handling
skew; every aggregate partial-aggregates map-side (asserted for q1 in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark.io import table
from bpspark.registry import op

def _rev():
    """Discounted line revenue (built lazily — Column construction needs
    an active SparkContext, and this module imports at registry load)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@op(
    "tpch_q01_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           ROUND(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price,
           ROUND(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report), cutoff shifted into this
    corpus's 1995-2001 date range. One scan, pushed shipdate filter,
    8 aggregates in a single partial+final hash aggregate over a
    3×2-group key — the canonical scan-bound report at any scale.
    avg_* follow the rounded-sum/count rule (exact cross-engine)."""
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= _ts("2001-09-02"))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
            F.round(F.sum(_rev() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / cnt).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@op(
    "tpch_q03_shipping_priority",
    sql="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority; o_shippriority column absent — output
    carries the order date instead). The segment-filtered customer side
    is broadcast (one market segment = ~1/5 of customers; at 100 TB this
    is the smallest input by far after the date filters), so the only
    shuffle is the orders⋈lineitem key exchange + the group-by reusing
    it. Top-10 is a tie-free TakeOrdered (revenue, then key) — no global
    sort materialization."""
    cust = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@op(
    "tpch_q05_local_supplier_volume",
    sql="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q05_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-way join where supplier and
    customer must share a nation inside one region. nation⋈region
    collapses to a broadcast nation-key set; supplier joins it broadcast
    (suppliers per region ≪ facts even at scale); the c_nationkey =
    s_nationkey correlation rides the customer⋈orders join key-extended —
    so the fact tables shuffle exactly once each."""
    nat = (
        table(spark, sf, "nation")
        .join(
            F.broadcast(table(spark, sf, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = table(spark, sf, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", _rev().alias("rev"))
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@op(
    "tpch_q06_forecast_revenue",
    sql="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q06_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan + conjunctive
    pushed predicate + global aggregate — the minimum-plan query whose
    entire cost is the columnar scan; parquet min/max skips prune
    non-1997 files under a date-clustered layout (cf. layout.py)."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@op(
    "tpch_q07_volume_shipping",
    sql="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q07_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations). Both nation maps
    broadcast; the nation-pair predicate lands on the customer and
    supplier BUILD sides before the fact joins, so ~2/25 of customers
    and suppliers survive into the join — the supplier side broadcast,
    the customer side riding the orders shuffle."""
    nat = table(spark, sf, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")
    sup = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(table(spark, sf, "orders").select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@op(
    "tpch_q08_market_share",
    sql="""
    WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part     ON l_partkey = p_partkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
             / ROUND(SUM(volume), 2) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q08_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share of NATION_3 suppliers in AMERICA
    for PROMO parts; p_type here is a single-word domain). The
    type-filtered part table broadcasts (1/6 of parts), region-filtered
    customers ride the orders shuffle, and the share is a conditional-
    sum ratio computed inside one aggregate — rounded-sum over
    rounded-sum for exact cross-engine division."""
    nat = table(spark, sf, "nation")
    cust_amer = (
        table(spark, sf, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    sup = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    part_promo = table(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1999-01-01"))
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey", _rev().alias("volume"))
    vol = (
        li.join(F.broadcast(part_promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_amer, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(F.year("o_orderdate").alias("o_year"), "volume", "supp_nation")
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)), 2
                )
                / F.round(F.sum("volume"), 2)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@op(
    "tpch_q10_returned_items",
    sql="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting, one quarter; address/phone/
    comment columns absent from the schema). Returns-only lineitem joins
    quarter-filtered orders on the order key (one shuffle), then the
    per-customer aggregate joins customer+broadcast nation on the
    customer key (second shuffle, already the aggregate's partitioning).
    Tie-free top-20 by (revenue, custkey) via TakeOrdered."""
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = table(spark, sf, "customer").join(
        F.broadcast(table(spark, sf, "nation").select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@op(
    "tpch_q13_customer_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution; the spec's
    comment-pattern exclusion becomes an o_orderpriority <> '5-LOW'
    exclusion — same join-condition-filter shape on this schema).
    Orders pre-aggregate to per-customer counts BEFORE the customer
    join (partial agg on the shuffle key), the left join fills
    zero-order customers, and the final distribution groups a
    |customers|-row frame down to ~tens of rows."""
    counts = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        table(spark, sf, "customer")
        .join(counts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@op(
    "tpch_q14_promo_revenue",
    sql="""
    SELECT 100.00
           * ROUND(SUM(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END), 2)
           / ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect, one month): month-filtered lineitem
    joins the part TYPE map broadcast (only p_partkey+p_type project —
    column pruning keeps the build side two columns wide at any scale);
    the percentage is a conditional-sum ratio in one aggregate."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = table(spark, sf, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.round(F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)), 2)
                / F.round(F.sum(_rev()), 2)
            ).alias("promo_revenue")
        )
    )


@op(
    "tpch_q15_top_supplier",
    sql="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier, one quarter): per-supplier revenue
    aggregate (|suppliers| rows), its global max reduced to a 1-row
    frame cross-joined back as the filter — the scalar-subquery shape
    without recomputing the aggregate (the revenue frame feeds both
    sides; Spark reuses the exchange — cf. q_exchange_reuse_self_join).
    Rounded revenue makes the max-equality exact cross-engine."""
    rev = (
        table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(table(spark, sf, "supplier").select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@op(
    "tpch_q17_small_quantity_revenue",
    sql="""
    SELECT ROUND(ROUND(SUM(l_extendedprice), 2) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.5 * (SUM(l2.l_quantity) / COUNT(*))
          FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; p_container absent, the
    brand predicate carries the selectivity). The correlated per-part
    average becomes a per-part aggregate joined back on the part key —
    the decorrelation every optimizer performs; the brand-filtered part
    list broadcasts into BOTH the average build and the final join, so
    the per-part averages are only computed for the ~1/25 surviving
    parts. sum/count (not AVG) keeps the threshold bit-identical."""
    part = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = table(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    li_brand = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    avgs = (
        li_brand.groupBy(F.col("l_partkey").alias("ak"))
        .agg((F.lit(0.5) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("half_avg_qty"))
    )
    return (
        li_brand.join(avgs, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 2).alias("avg_yearly")
        )
    )


@op(
    "tpch_q18_large_volume_customer",
    sql="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS orderdate,
           o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 140
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): per-order quantity sums
    computed FIRST on the lineitem side (partial agg on l_orderkey —
    the spec's IN-subquery decorrelated), the >140 HAVING prunes before
    any wide join, and only surviving orders join customer. Quantity
    sums are exact integers in doubles, so the HAVING is cross-engine
    exact. Tie-free top-20 on (o_totalprice, o_orderkey)."""
    qty = (
        table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 140)
    )
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        qty.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )
