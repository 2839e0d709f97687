"""Iterative graph algorithms on DataFrames.

Connected components already powers dedup_cluster_cc (llm_ops); this
module adds PageRank — the canonical iterative join+agg loop. The pattern
for ALL DataFrame iteration at scale: cache the loop-invariant edge list
partitioned on the join key, re-derive a small ranks frame each round
(one shuffle co-partitioned with edges), and localCheckpoint every few
rounds to truncate the lineage Catalyst would otherwise re-analyze
exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark.io import table
from bpspark.registry import op

_DAMPING = 0.85
_ITERATIONS = 5


@op("graph_pagerank")
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph (an edge per
    distinct (o_custkey, l_suppkey) pair that co-occurs in an order,
    symmetrized so every node has out-degree and rank mass is conserved:
    Σranks = N at every step). 5 rounds of contribution join + hash agg;
    edges are deduped, cached, and hash-partitioned on src once, so each
    round's join reuses that exchange and only the (node, rank) frame
    (tiny relative to edges) moves. Rows-only op (iterative float
    fixpoint — no SQL oracle); the property test checks mass
    conservation, positivity, and degree-monotonicity."""
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = cs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        cs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant: (src, dst, deg(src)), hash-partitioned on src once
    ew = edges.join(out_deg, "src").repartition("src").cache()
    ranks = out_deg.select("src", F.lit(1.0).alias("rank")).localCheckpoint()
    for _ in range(_ITERATIONS):
        contribs = (
            ew.join(ranks, "src")
            .select(
                F.col("dst").alias("src"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("src")
            .agg(F.sum("contrib").alias("mass"))
        )
        # eager localCheckpoint: the ranks frame is |nodes| rows (tiny next
        # to edges) — truncating its lineage every round keeps the plan
        # flat instead of 8 joins deep (on a real cluster: checkpoint())
        ranks = contribs.select(
            "src",
            (F.lit(1.0 - _DAMPING) + F.lit(_DAMPING) * F.col("mass")).alias("rank"),
        ).localCheckpoint()
    return (
        ranks.select(F.col("src").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )
