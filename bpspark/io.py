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

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Depending on the
    Spark version this arrives as TIMESTAMP_NTZ (4.x reads NANOS natively,
    floor-truncated to µs — identical to DuckDB's µs arithmetic) or, under
    the legacy ``nanosAsLong`` conf, as raw-nano LongType. Normalize either
    to a µs TimestampType so every downstream op sees one type. Still a
    plain columnar scan with pushdown for every other column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
