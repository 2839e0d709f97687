"""Relational operator surface (SURVEY.md §2.3): projections, filters,
joins, aggregations, windows, sorts/limits, set operations.

Design: every op is a *declarative* DataFrame plan — Catalyst gets to push
predicates into the parquet scan, prune columns, pick broadcast-vs-shuffle
joins, and AQE re-plans at runtime. Nothing here collects to the driver.

Reference grounding (see SURVEY.md §2.1 R# ids): the semi/anti-join ops are
the Spark form of the genre validation (R7,
services/MetadataIngestionServiceImpl.java:170-173) and the three
idempotency existence checks (R8-R10, :181-210); the map projection is the
typed key projection (R12, :230-236).

Scale notes are inline per op — what the plan does at 100 TB, not just sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bpspark.io import table
from bpspark.registry import op


# ---------------------------------------------------------------------------
# Scan / projection / filter
# ---------------------------------------------------------------------------

@op("scan_parquet", sql="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def scan_parquet(spark: SparkSession, sf: str) -> DataFrame:
    """Columnar parquet scan (R1 batch form). At scale: splittable columnar
    scan with predicate/column pushdown; nothing to tune."""
    return table(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")


@op(
    "project_rename_cast",
    sql="""
    SELECT CAST(c_custkey AS VARCHAR) AS cust_id,
           c_name AS cust_name,
           CAST(c_nationkey AS BIGINT) AS nation_id,
           c_acctbal AS acct_bal
    FROM customer
    """,
)
def project_rename_cast(spark: SparkSession, sf: str) -> DataFrame:
    """R12: select named columns, alias, cast types. Pure narrow projection —
    column pruning reaches the scan (ReadSchema shows 4 columns)."""
    c = table(spark, sf, "customer")
    return c.select(
        F.col("c_custkey").cast("string").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_nationkey").cast("bigint").alias("nation_id"),
        F.col("c_acctbal").alias("acct_bal"),
    )


@op(
    "project_map_keys",
    sql="SELECT doc_id, lang AS lang_val, source AS source_val FROM documents",
)
def project_map_keys(spark: SparkSession, sf: str) -> DataFrame:
    """R12 over the dynamic-metadata model (SURVEY §1.2): pack columns into a
    map<string,string> (the reference's Properties record) and project typed
    values back out with element_at. Oracle sees the identity round-trip."""
    d = table(spark, sf, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"),
        F.lit("source"), F.col("source"),
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
    )


@op(
    "filter_comparison",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 25.0 AND l_extendedprice <= 5000.0 AND l_discount <> 0.0
    """,
)
def filter_comparison(spark: SparkSession, sf: str) -> DataFrame:
    """Comparison predicates; all three push down to the parquet scan."""
    li = table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 25.0)
        & (F.col("l_extendedprice") <= 5000.0)
        & (F.col("l_discount") != 0.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@op(
    "filter_boolean_logic",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 100000.0)
       OR (NOT o_orderpriority = '1-URGENT' AND o_totalprice < 5000.0)
    """,
)
def filter_boolean_logic(spark: SparkSession, sf: str) -> DataFrame:
    """AND/OR/NOT composition; Catalyst CNF-normalizes for pushdown."""
    o = table(spark, sf, "orders")
    pred = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)) | (
        (~(F.col("o_orderpriority") == "1-URGENT")) & (F.col("o_totalprice") < 5000.0)
    )
    return o.filter(pred).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@op(
    "filter_isin",
    sql="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def filter_isin(spark: SparkSession, sf: str) -> DataFrame:
    """R7 degenerate form: membership in a literal list (genre check when the
    dimension is small enough to inline)."""
    c = table(spark, sf, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )


@op(
    "filter_like_regex",
    sql="""
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE '%widget%' AND regexp_matches(p_brand, 'Brand#1[0-9]')
    """,
)
def filter_like_regex(spark: SparkSession, sf: str) -> DataFrame:
    """R2: LIKE / regexp predicates (the filename-key extraction family)."""
    p = table(spark, sf, "part")
    return p.filter(
        F.col("p_name").like("%widget%") & F.col("p_brand").rlike("Brand#1[0-9]")
    ).select("p_partkey", "p_name", "p_brand")


@op(
    "filter_null_required",
    sql="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
    FROM orders
    WHERE NULLIF(o_orderstatus, 'P') IS NOT NULL
    """,
)
def filter_null_required(spark: SparkSession, sf: str) -> DataFrame:
    """R6: required-field null routing (missing book record → reject,
    MetadataIngestionServiceImpl.java:106-110). Happy path shown; the error
    channel takes the isNull side (see bpspark.errors)."""
    o = table(spark, sf, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null")
    return o.select("o_orderkey", status_or_null).filter(F.col("status_or_null").isNotNull())


@op(
    "filter_between_range",
    sql="""
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
    """,
)
def filter_between_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range predicate on timestamps — min/max pruning at the parquet
    row-group level makes this near-free on partitioned 100 TB layouts."""
    o = table(spark, sf, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31 23:59:59").cast("timestamp"),
        )
    ).select("o_orderkey", "o_orderdate")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@op(
    "join_broadcast_dim",
    sql="""
    SELECT c_custkey, n_name AS nation_name, r_name AS region_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Fact × small dims. Explicit broadcast(): at 100 TB the fact side never
    shuffles — each task hash-probes an in-memory dim copy."""
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", F.col("n_name").alias("nation_name"), F.col("r_name").alias("region_name"))
    )


@op(
    "join_shuffle_inner",
    sql="""
    SELECT o_orderkey, l_linenumber, o_totalprice, l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def join_shuffle_inner(spark: SparkSession, sf: str) -> DataFrame:
    """Large × large equi join: both sides shuffle on the key; Spark picks
    sort-merge (or shuffled-hash under AQE). Skewed keys are split by AQE
    skew-join. At 100 TB: co-bucket both tables on orderkey to eliminate the
    shuffle entirely (see docs/SCALE.md)."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "o_totalprice", "l_extendedprice"
    )


@op(
    "join_left_outer",
    sql="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer: unmatched customers kept with null orderkey."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


@op(
    "join_semi_validate",
    sql="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def join_semi_validate(spark: SparkSession, sf: str) -> DataFrame:
    """R7: dimension-membership validation as a broadcast left-semi join
    (genre check, MetadataIngestionServiceImpl.java:112-116). The dim side is
    broadcast, so validation adds zero shuffles to the fact scan."""
    o = table(spark, sf, "orders")
    dim = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(
        F.broadcast(dim), o.o_custkey == dim.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")


@op(
    "join_anti_dedup",
    sql="""
    SELECT DISTINCT a.l_partkey, a.l_suppkey
    FROM lineitem a
    WHERE a.l_shipdate >= TIMESTAMP '2001-01-01'
      AND NOT EXISTS (SELECT 1 FROM lineitem b
                      WHERE b.l_shipdate < TIMESTAMP '2001-01-01'
                        AND b.l_partkey = a.l_partkey
                        AND b.l_suppkey = a.l_suppkey)
    ORDER BY l_partkey, l_suppkey
    """,
)
def join_anti_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """R8-R10: new-key detection via left-anti join — the Spark form of the
    reference's three idempotency existence checks
    (MetadataIngestionServiceImpl.java:181-210): (part, supplier)
    combinations first shipped in 2001, i.e. arrival keys absent from the
    pre-2001 ledger. (The previous customers-without-orders form was
    degenerate — every customer has ~10 orders at every SF, so the r1
    driver row certified an empty result; the pair keyspace is sparse and
    churns, yielding 54/5438/71793 new pairs at sf0.001/0.01/0.1.) At
    scale the ledger side is distinct-reduced before the anti join
    (map-side partial dedup), broadcast when small; else shuffle-anti
    with AQE."""
    li = table(spark, sf, "lineitem")
    cut = F.lit("2001-01-01").cast("timestamp")
    arrivals = (
        li.filter(F.col("l_shipdate") >= cut)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    ledger = li.filter(F.col("l_shipdate") < cut).select("l_partkey", "l_suppkey")
    return (
        arrivals.join(ledger, ["l_partkey", "l_suppkey"], "left_anti")
        .orderBy("l_partkey", "l_suppkey")
    )


@op(
    "join_theta_range",
    sql="""
    SELECT e1.event_id AS a_event_id, e2.event_id AS b_event_id, e1.user_id
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    """,
)
def join_theta_range(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi range join with an equi component: events within 5 minutes
    after each event for the same user. The user_id equi key lets Spark use a
    hash/sort-merge join with the range as a join residual — NOT a cartesian
    product; this is the scalable way to write theta joins at 100 TB."""
    e1 = table(spark, sf, "events").alias("e1")
    e2 = table(spark, sf, "events").alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return e1.join(e2, cond).select(
        F.col("e1.event_id").alias("a_event_id"),
        F.col("e2.event_id").alias("b_event_id"),
        F.col("e1.user_id").alias("user_id"),
    )


@op(
    "join_asof_latest_prior",
    sql="""
    SELECT o_orderkey, prev_orderkey, prev_orderdate FROM (
        SELECT o1.o_orderkey,
               o2.o_orderkey AS prev_orderkey,
               o2.o_orderdate AS prev_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o1.o_orderkey
                   ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC
               ) AS rn
        FROM orders o1
        JOIN orders o2
          ON o1.o_custkey = o2.o_custkey
         AND (o2.o_orderdate < o1.o_orderdate
              OR (o2.o_orderdate = o1.o_orderdate AND o2.o_orderkey < o1.o_orderkey))
    ) WHERE rn = 1
    """,
)
def join_asof_latest_prior(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (latest row at-or-before): for each order, the same
    customer's most recent prior order. Spark has no native as-of join
    (SURVEY §7.4.2). Three emulations were built and benched:

    1. row_number window over an equi-join fan-out — slowest;
    2. equi-join on the entity key + ``max_by`` argmax — partial-aggregates
       map-side, but the join itself still *computes* O(orders-per-
       customer²) row pairs before the collapse: quadratic work on a
       skewed entity key (the round-1 scale-risk finding);
    3. tagged-union sort (this implementation): union probe rows (side 0)
       and build rows (side 1), ONE shuffle on the entity key, per-
       partition sort by (time, key, side), running
       ``last(build-struct, ignorenulls)`` over rows UNBOUNDED
       PRECEDING..-1. At equal (time, key) the probe sorts before its own
       build twin, so "strictly prior" falls out of the sort order —
       no join node exists at all, total work is O(n log n) per entity
       partition and the only data movement is the one hash exchange.
       A 1M-order customer costs a 2M-row sorted partition (spillable),
       not 10¹² joined pairs. This is the plan shape that survives
       100 TB; plan-asserted in tests/test_plans.py (no Join, single
       Exchange).

    All three produce identical results (oracle hash-checked)."""
    o = table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    # r12: the tagged union is built by EXPLODING a [0, 1] side array —
    # one scan of the fact table instead of the union's two (at 100 TB the
    # probe/build duplication halves the input read; results identical,
    # proven by exceptAll + oracle hash)
    both = o.select("*", F.explode(F.array(F.lit(0), F.lit(1))).alias("side"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey", "side")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(
            F.col("side") == 1,
            F.struct(
                F.col("o_orderkey").alias("prev_orderkey"),
                F.col("o_orderdate").alias("prev_orderdate"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        both.withColumn("prev", prev)
        .filter((F.col("side") == 0) & F.col("prev").isNotNull())
        .select("o_orderkey", "prev.prev_orderkey", "prev.prev_orderdate")
    )


@op(
    "join_cross_small",
    sql="""
    SELECT r1.r_name AS a_region, r2.r_name AS b_region
    FROM region r1 CROSS JOIN region r2
    """,
)
def join_cross_small(spark: SparkSession, sf: str) -> DataFrame:
    """Cartesian of two tiny dims (5×5). Only ever valid for dims — the engine
    never cross-joins fact tables (LLM similarity ops use LSH pruning)."""
    r1 = table(spark, sf, "region").alias("r1")
    r2 = table(spark, sf, "region").alias("r2")
    return r1.crossJoin(r2).select(
        F.col("r1.r_name").alias("a_region"), F.col("r2.r_name").alias("b_region")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@op(
    "agg_group_sums",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_quantity), 2) / COUNT(*) AS avg_qty,
           ROUND(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price,
           ROUND(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sums(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape (the flagship): scan → pushed filter → hash aggregate
    with map-side partial aggregation → tiny shuffle (one row per group).
    This is the canonical 100 TB-safe shape: shuffle volume = #groups."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            # "stabilize then derive": ROUND(SUM,2) of exact-2dp inputs snaps
            # both engines to the same double (no .5 boundary can exist);
            # dividing by the int count is then IEEE-deterministic → the avg
            # is bit-identical cross-engine without a lossy final round.
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@op(
    "agg_global",
    sql="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           ROUND(MIN(l_quantity), 2) AS min_qty,
           ROUND(MAX(l_quantity), 2) AS max_qty
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf: str) -> DataFrame:
    """Ungrouped aggregate: partial-aggregates per partition, single-row final."""
    li = table(spark, sf, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


@op(
    "agg_count_distinct",
    sql="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct per group — Spark expands to a two-stage aggregate.
    At 100 TB prefer agg_approx_distinct unless exactness is contractual."""
    o = table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@op("agg_approx_distinct", sql=None)  # approximate → rows-only (SURVEY §2.3)
def agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog distinct (NS, 100 TB posture): constant memory per group,
    mergeable sketches — the only sane distinct at 10^11 rows. rsd=0.01."""
    o = table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers")
    )


@op(
    "agg_having",
    sql="""
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 300000.0
    """,
)
def agg_having(spark: SparkSession, sf: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = table(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_raw_total"),
        )
        .filter(F.col("_raw_total") > 300000.0)
        .drop("_raw_total")
    )


@op(
    "agg_rollup",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Subtotal hierarchy: (a,b), (a), () grouping sets in one pass."""
    o = table(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@op(
    "agg_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) / COUNT(*) AS avg_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    """All grouping combinations."""
    o = table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
    )


@op(
    "agg_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit grouping sets via the native DataFrame API (Spark 4) —
    a single Expand + aggregate, no temp-view catalog mutation."""
    o = table(spark, sf, "orders")
    return o.groupingSets(
        [[F.col("o_orderstatus")], [F.col("o_orderpriority")]],
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@op(
    "distinct_rows",
    sql="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level dedup (NS dedup family, exact): hash-aggregate on all cols;
    map-side partials keep the shuffle at #distinct rows."""
    return table(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@op(
    "win_row_number_topk",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def win_row_number_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group. Spark inserts a partial window-group-limit before the
    shuffle (WindowGroupLimit) so only ~k rows per group per partition move."""
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@op(
    "win_rank_dense",
    sql="""
    SELECT p_partkey, p_brand, p_size,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf: str) -> DataFrame:
    """rank/dense_rank with ties (tie values get equal ranks → deterministic)."""
    p = table(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey", "p_brand", "p_size",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


@op(
    "win_lag_lead",
    sql="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """Prior/next row values per user (event deltas). Total order inside the
    partition via (ts, event_id) tiebreak → deterministic."""
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@op(
    "win_running_sum",
    sql="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative sum per customer (rows frame)."""
    o = table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@op(
    "win_moving_avg_range",
    sql="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
           ), 2) / COUNT(*) OVER (
               ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
           ) AS moving_avg
    FROM orders
    """,
)
def win_moving_avg_range(spark: SparkSession, sf: str) -> DataFrame:
    """Value-range frame moving average. NOTE: a global (unpartitioned) window
    is a single-task sort at scale — real pipelines partition by entity/time
    bucket first; kept global here to exercise the RANGE frame semantics."""
    o = table(spark, sf, "orders")
    w = Window.orderBy("o_orderkey").rangeBetween(-100, Window.currentRow)
    moving_avg = F.round(F.sum("o_totalprice").over(w), 2) / F.count(F.lit(1)).over(w)
    return o.select("o_orderkey", moving_avg.alias("moving_avg"))


@op(
    "win_ntile_first_last",
    sql="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS balance_quartile,
           FIRST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS poorest_custkey,
           LAST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_custkey
    FROM customer
    """,
)
def win_ntile_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """ntile buckets + first/last over an explicit full frame."""
    c = table(spark, sf, "customer")
    order = [F.col("c_acctbal"), F.col("c_custkey")]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.first("c_custkey").over(wf).alias("poorest_custkey"),
        F.last("c_custkey").over(wf).alias("richest_custkey"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------

@op(
    "sort_multi_key",
    sql="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null, o_totalprice
    FROM orders
    ORDER BY status_or_null DESC NULLS LAST, o_totalprice DESC, o_orderkey
    """,
)
def sort_multi_key(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-key sort with null placement. Spark: range-partitioned sample
    sort — scales to any size (no single-node sort)."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("status_or_null").desc_nulls_last(), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )


@op(
    "limit_n",
    sql="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
)
def limit_n(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic limit (ordered by unique key so the row set is stable)."""
    o = table(spark, sf, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@op(
    "topk_global",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER BY + LIMIT fused to TakeOrderedAndProject: each partition keeps
    its local top-k, driver merges k×partitions rows — no global sort."""
    o = table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@op(
    "set_union_all",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf: str) -> DataFrame:
    """Bag union — no shuffle at all, just concatenated partitions."""
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


@op(
    "set_union_distinct",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Set union = union + hash dedup."""
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@op(
    "set_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Set intersection (distinct semantics)."""
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@op(
    "set_except",
    sql="""
    SELECT o_orderkey AS orderkey FROM orders
    EXCEPT
    SELECT l_orderkey AS orderkey FROM lineitem
    """,
)
def set_except(spark: SparkSession, sf: str) -> DataFrame:
    """Set difference — the ledger-diff form of the idempotency checks
    (R8-R10): keys present in arrivals but not in the ledger, here orders
    that have NO line items yet (the unfulfilled backlog). (The previous
    customer-minus-supplier nationkey form was degenerate — suppliers
    cover every customer nation at every SF, so the r1 driver row
    certified an empty result; orders without lineitems number
    27/257/2764 at sf0.001/0.01/0.1.)"""
    o = table(spark, sf, "orders").select(F.col("o_orderkey").alias("orderkey"))
    li = table(spark, sf, "lineitem").select(F.col("l_orderkey").alias("orderkey"))
    return o.subtract(li)  # EXCEPT (distinct) semantics
