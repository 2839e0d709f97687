"""Driver-contract smoke: entry() runs and returns rows with a stable schema."""

from __future__ import annotations


def test_entry_flagship(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_oracle_keys_subset(spark):
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "no queries registered"
    assert set(o).issubset(set(q)), "oracle keys must be a subset of query keys"
