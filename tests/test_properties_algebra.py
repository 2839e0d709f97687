"""Algebraic property spot-checks (SURVEY §5.2.4): relation-algebra
identities that must hold regardless of data."""

from __future__ import annotations

from pyspark.sql import functions as F

from bpspark.io import table
from tests.conftest import SF_SMALL


def test_semi_union_anti_partitions_input(spark):
    """semi(A,B) ∪ anti(A,B) == A, disjointly (the R7/R8-R10 pair)."""
    o = table(spark, SF_SMALL, "orders")
    dim = table(spark, SF_SMALL, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    semi = o.join(dim, o.o_custkey == dim.c_custkey, "left_semi")
    anti = o.join(dim, o.o_custkey == dim.c_custkey, "left_anti")
    n, ns, na = o.count(), semi.count(), anti.count()
    assert ns + na == n
    assert semi.join(anti.select("o_orderkey"), "o_orderkey", "left_semi").count() == 0


def test_running_sum_telescopes_to_group_sum(spark):
    """last running_sum per group == group total (frame telescoping)."""
    from bpspark.relational import win_running_sum

    rs = win_running_sum(spark, SF_SMALL)
    last_per_cust = rs.groupBy("o_custkey").agg(F.max("running_total").alias("rt"))
    totals = (
        table(spark, SF_SMALL, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("tot"))
    )
    joined = last_per_cust.join(totals, "o_custkey")
    mismatched = joined.filter(F.abs(F.col("rt") - F.col("tot")) > 0.011).count()
    assert mismatched == 0


def test_dedup_idempotent(spark):
    """f∘f = f for distinct()."""
    li = table(spark, SF_SMALL, "lineitem").select("l_returnflag", "l_linestatus")
    once = li.distinct()
    twice = once.distinct()
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0


def test_cosine_self_similarity_is_one(spark):
    """cos(v, v) == 1 for every vector (normalization sanity)."""
    from bpspark.llm_ops import _dot, _with_norm

    e = _with_norm(table(spark, SF_SMALL, "embeddings"))
    self_cos = e.select(
        (_dot(F.col("embedding"), F.col("embedding")) / (F.col("norm") * F.col("norm"))).alias("c")
    )
    bad = self_cos.filter(F.abs(F.col("c") - 1.0) > 1e-9).count()
    assert bad == 0


def test_union_all_counts_add(spark):
    c = table(spark, SF_SMALL, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, SF_SMALL, "supplier").select(F.col("s_nationkey").alias("k"))
    assert c.unionByName(s).count() == c.count() + s.count()
