"""Table loaders for the driver-provided parquet testdata (TESTDATA.md).

One function so every operator reads through the same path: a plain
columnar parquet scan that Catalyst can push filters/projections into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table; filters/pruning push into the parquet read.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. We read it as raw nanos (legacy conf) and
    convert to a microsecond TimestampType — the same truncation DuckDB's
    µs-timestamp arithmetic applies. Still a plain columnar scan with
    pushdown for every other column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
