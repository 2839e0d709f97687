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


def test_python_datasource_partition_parallel(spark):
    """The custom Python DataSource must expose its declared partitioning
    to Spark (8 InputPartitions → 8 tasks) and produce the full record
    range exactly once."""
    from bpspark.registry import all_ops

    df = all_ops()["scan_python_datasource"].fn(spark, "/root/testdata/sf0.001")
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 1000
    assert {r.book_id for r in rows} == set(range(1000))
