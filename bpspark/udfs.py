"""UDF / UDAF / UDTF surface (SURVEY §2.3): the four Python-extension
shapes, all Arrow-batched (never row-pickled).

These demonstrate the *slow path* done right — vectorized pandas bodies,
narrow input projections so Arrow transfers only needed columns, and
deterministic math so even Python ops stay oracle-checkable:

- scalar pandas UDF: ISBN-13 check digit (R2's key-validation family)
- grouped-aggregate pandas UDF: exact order-independent group stats
- applyInPandas (grouped map): per-group min-max normalization
- mapInPandas (partition flat-map): the ZIP-parser shape (R3/R4) on
  plain columns

Scale: pandas UDFs run in forked Python workers per executor core with
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch). The grouped
variants shuffle by the group key first — same partitioning rules as any
aggregation."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bpspark.io import table
from bpspark.registry import op


# --- scalar pandas UDF ------------------------------------------------------

# NOTE: pandas_udf() parses its DDL type string through the active session,
# so UDF objects are built lazily inside the op functions, not at import.

def _isbn13_check_digit_body(key: pd.Series) -> pd.Series:
    """Check digit of the ISBN-13 '978' + zero-padded 9-digit key —
    vectorized string → digit-matrix arithmetic."""
    import numpy as np

    isbn12 = "978" + key.astype("int64").astype(str).str.zfill(9)
    digits = isbn12.map(lambda s: [int(c) for c in s])
    mat = np.vstack(digits.to_numpy())
    weights = np.tile([1, 3], 6)
    return pd.Series((10 - (mat * weights).sum(axis=1) % 10) % 10).astype("int32")


@op(
    "udf_scalar_pandas",
    sql="""
    WITH d AS (
        SELECT c_custkey, '978' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS isbn12
        FROM customer
    )
    SELECT c_custkey, isbn12,
           CAST((10 - (
               CAST(isbn12[1] AS INT) * 1 + CAST(isbn12[2] AS INT) * 3 +
               CAST(isbn12[3] AS INT) * 1 + CAST(isbn12[4] AS INT) * 3 +
               CAST(isbn12[5] AS INT) * 1 + CAST(isbn12[6] AS INT) * 3 +
               CAST(isbn12[7] AS INT) * 1 + CAST(isbn12[8] AS INT) * 3 +
               CAST(isbn12[9] AS INT) * 1 + CAST(isbn12[10] AS INT) * 3 +
               CAST(isbn12[11] AS INT) * 1 + CAST(isbn12[12] AS INT) * 3
           ) % 10) % 10 AS INT) AS check_digit
    FROM d
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Vectorized scalar UDF (R2 key-checksum family) — Arrow in, Arrow out;
    the oracle recomputes the checksum in pure SQL arithmetic."""
    c = table(spark, sf, "customer")
    isbn12 = F.concat(F.lit("978"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    check = pandas_udf(_isbn13_check_digit_body, "int")
    return c.select(
        "c_custkey",
        isbn12.alias("isbn12"),
        check(F.col("c_custkey")).alias("check_digit"),
    )


# --- grouped-aggregate pandas UDF ------------------------------------------

def _n_above_5k_body(v: pd.Series) -> int:
    return int((v > 5000.0).sum())


def _series_min_body(v: pd.Series) -> float:
    return float(v.min())


def _series_max_body(v: pd.Series) -> float:
    return float(v.max())


@op(
    "udaf_grouped_pandas",
    sql="""
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE c_acctbal > 5000.0) AS n_above_5k,
           MIN(c_acctbal) AS bal_min,
           MAX(c_acctbal) AS bal_max
    FROM customer GROUP BY c_mktsegment
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG pandas UDFs. Statistics chosen to be order-independent
    and float-exact (count/min/max) so the Python path stays fully
    oracle-checkable — a sum-of-doubles UDAF would diverge from the oracle
    in the last bits depending on accumulation order."""
    c = table(spark, sf, "customer")
    n_above = pandas_udf(_n_above_5k_body, "long")
    smin = pandas_udf(_series_min_body, "double")
    smax = pandas_udf(_series_max_body, "double")
    return c.groupBy("c_mktsegment").agg(
        n_above("c_acctbal").alias("n_above_5k"),
        smin("c_acctbal").alias("bal_min"),
        smax("c_acctbal").alias("bal_max"),
    )


# --- applyInPandas (grouped map / UDTF shape) -------------------------------

def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    span = hi - lo
    pdf = pdf.copy()
    pdf["bal_normalized"] = 0.0 if span == 0 else (pdf["c_acctbal"] - lo) / span
    return pdf[["c_custkey", "c_nationkey", "bal_normalized"]]


@op(
    "udtf_apply_in_pandas",
    sql="""
    SELECT c_custkey, c_nationkey,
           CASE WHEN MAX(c_acctbal) OVER w = MIN(c_acctbal) OVER w THEN 0.0
                ELSE (c_acctbal - MIN(c_acctbal) OVER w)
                     / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w) END AS bal_normalized
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map transform (the per-ISBN normalization shape, R3):
    per-nation min-max scaling. Exact operands → the division is
    bit-identical with the SQL-window oracle."""
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return c.groupBy("c_nationkey").applyInPandas(
        _minmax_normalize, "c_custkey long, c_nationkey int, bal_normalized double"
    )


# --- mapInPandas (partition flat-map) ---------------------------------------

def _enrich_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "name_len": pdf["c_name"].str.len().astype("int32"),
                "key_parity": (pdf["c_custkey"] % 2).map({0: "even", 1: "odd"}),
                "seg_code": pdf["c_mktsegment"].str.slice(0, 3).str.lower(),
            }
        )
        yield out


@op(
    "udtf_map_in_pandas",
    sql="""
    SELECT c_custkey,
           CAST(length(c_name) AS INT) AS name_len,
           CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS key_parity,
           lower(substring(c_mktsegment, 1, 3)) AS seg_code
    FROM customer
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-wise flat map — the shape the ZIP parser runs in (R3/R4;
    see bpspark.sources.parse_zip_entries for the binary version)."""
    c = table(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return c.mapInPandas(
        _enrich_batches,
        "c_custkey long, name_len int, key_parity string, seg_code string",
    )


@op(
    "udtf_python_native",
    sql="""
    SELECT doc_id,
           CAST(idx - 1 AS INT) AS sent_idx,
           sent
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(text, '[.!?]+\\s*')) AS sent,
               generate_subscripts(regexp_split_to_array(text, '[.!?]+\\s*'), 1) AS idx
        FROM documents
    )
    WHERE sent <> ''
    ORDER BY doc_id, sent_idx
    """,
)
def udtf_python_native(spark: SparkSession, sf: str) -> DataFrame:
    """The PySpark 4 native Python UDTF API (@udtf, one-row-in/N-rows-out
    with LATERAL-join semantics): sentence segmentation, one output row
    per sentence with its ordinal. This is the row-generator counterpart
    to mapInPandas — the API a user reaches for when each input row
    explodes into a variable number of typed rows. Arrow-batched; the
    split regex is shared verbatim with the DuckDB oracle (both engines'
    regex dialects agree on this pattern)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sent string")
    class SentenceSplit:
        def eval(self, doc_id, text):
            for i, s in enumerate(re.split(r"[.!?]+\s*", text)):
                if s != "":
                    yield doc_id, i, s

    d = table(spark, sf, "documents").select("doc_id", "text")
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sent
        FROM _udtf_docs,
        LATERAL sentence_split(doc_id, text) AS s
        """
    )
    return out.orderBy("doc_id", "sent_idx")


def _arrow_token_count(batches):
    """mapInArrow body: RecordBatch → RecordBatch with a token_count column
    computed via pyarrow.compute — zero pandas materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        toks = pc.list_value_length(pc.split_pattern(batch.column(1), " "))
        yield pa.RecordBatch.from_arrays(
            [batch.column(0), toks.cast(pa.int64())], ["doc_id", "token_count"]
        )


@op(
    "udtf_map_in_arrow",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
    FROM documents
    """,
)
def udtf_map_in_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python hook: raw Arrow
    RecordBatches in and out, no pandas conversion at all (mapInPandas
    pays Arrow→pandas→Arrow per batch; for columnar-in/columnar-out
    transforms that conversion IS most of the cost). The body counts
    whitespace tokens with pyarrow.compute kernels (C++, vectorized) —
    exact integer semantics, so the SQL oracle checks it bit-for-bit."""
    docs = table(spark, sf, "documents").select("doc_id", "text")
    return docs.mapInArrow(_arrow_token_count, "doc_id bigint, token_count bigint")


def _digit_sum_body(s: pd.Series) -> pd.Series:
    return s.astype("string").str.replace(r"[^0-9]", "", regex=True).map(
        lambda d: sum(int(ch) for ch in d) if d else 0
    ).astype("int64")


@op(
    "udf_sql_registered",
    # unrolled over all 19 possible int64 digit positions (r11 review: the
    # old 8-term unroll silently dropped digits of any key >= 1e8 — fine at
    # test SFs, a latent op-vs-oracle fork at production key ranges)
    sql="""
    SELECT o_orderkey,
           CAST(
             """
    + " + ".join(f"(o_orderkey // {10**i} % 10)" for i in range(19))
    + """
           AS BIGINT) AS digit_sum
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def udf_sql_registered(spark: SparkSession, sf: str) -> DataFrame:
    """A pandas UDF registered into the SQL function catalog
    (spark.udf.register) and invoked from SQL TEXT — the path that lets
    analysts call Python extensions from plain SQL. Registration is
    per-session and name-spaced bpspark_ to avoid collisions. Exact
    integer body (digit sum) → full oracle parity; the oracle unrolls
    the digit sum arithmetically."""
    from pyspark.sql.functions import pandas_udf as _pudf

    spark.udf.register("bpspark_digit_sum", _pudf(_digit_sum_body, "long"))
    table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, bpspark_digit_sum(o_orderkey) AS digit_sum
        FROM orders WHERE o_orderkey % 7 = 0
        """
    )


def _key_fold_arrow_body(k):
    """arrow_udf body: xorshift-fold the key and bucket mod 97 — pure
    pyarrow.compute integer kernels (C++, vectorized), no pandas."""
    import pyarrow.compute as pc

    folded = pc.bit_wise_xor(pc.shift_right(k, 13), k)
    # pyarrow.compute has no modulo kernel: x % m == x - (x // m) * m for
    # the non-negative int64 keys here (pc.divide truncates on integers)
    return pc.subtract(folded, pc.multiply(pc.divide(folded, 97), 97))


@op(
    "udf_scalar_arrow",
    sql="""
    SELECT o_orderkey,
           CAST(xor(o_orderkey >> 13, o_orderkey) % 97 AS BIGINT) AS fold_bucket
    FROM orders
    """,
)
def udf_scalar_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar Arrow UDF (Spark 4 ``arrow_udf``) — the vectorized scalar
    path one step below pandas_udf: the body receives a raw
    ``pyarrow.Array`` (no pandas Series wrapping, no index bookkeeping),
    so a columnar integer kernel pays only Arrow transfer. The body
    computes an exact xorshift fold (``(k >> 13) ^ k mod 97``) so the
    DuckDB oracle replays it bit-for-bit in SQL arithmetic. Scale: same
    executor-side Python worker model as pandas UDFs — Arrow batches
    stream per core; the projection ships one int64 column each way."""
    from pyspark.sql.functions import arrow_udf

    fold = arrow_udf(_key_fold_arrow_body, "bigint")
    o = table(spark, sf, "orders").select("o_orderkey")
    return o.select("o_orderkey", fold("o_orderkey").alias("fold_bucket"))


@op(
    "udtf_analyze_dynamic",
    sql="""
    SELECT doc_id,
           CASE WHEN len(string_split(text, ' ')) >= 1
                THEN string_split(text, ' ')[1] END AS w0,
           CASE WHEN len(string_split(text, ' ')) >= 2
                THEN string_split(text, ' ')[2] END AS w1,
           CASE WHEN len(string_split(text, ' ')) >= 3
                THEN string_split(text, ' ')[3] END AS w2
    FROM documents
    """,
)
def udtf_analyze_dynamic(spark: SparkSession, sf: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze()``): the output schema
    is COMPUTED AT PLAN TIME from the constant ``n`` argument — analyze()
    receives the literal and emits one ``wN`` string column per requested
    word, so callers pick their arity in SQL and Catalyst sees a fully
    typed schema (column pruning and downstream codegen work as if the
    schema were static). The class is function-local on purpose: the UDTF
    planner's Python worker runs before addPyFile state is guaranteed, so
    the class must pickle BY VALUE (see stream_python_datasource for the
    same constraint). Split semantics are single-space (Python
    ``split(' ')`` ≡ DuckDB ``string_split``), keeping the oracle exact."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class WordCols:
        @staticmethod
        def analyze(doc_id, text, n):
            fields = [StructField("doc_id", LongType())]
            fields += [StructField(f"w{i}", StringType()) for i in range(int(n.value))]
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, doc_id, text, n):
            words = (text or "").split(" ")
            yield tuple(
                [doc_id] + [words[i] if i < len(words) else None for i in range(int(n))]
            )

    spark.udtf.register("bpspark_word_cols", udtf(WordCols))
    table(spark, sf, "documents").createOrReplaceTempView("bpspark_docs_udtf")
    return spark.sql(
        """
        SELECT t.* FROM bpspark_docs_udtf,
        LATERAL bpspark_word_cols(doc_id, text, 3) t
        """
    )


@op(
    "udtf_table_partition_by",
    sql="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(MEDIAN(n_chars) AS DOUBLE) AS median_chars,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def udtf_table_partition_by(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 UDTF with a TABLE argument and input-partitioning clause:
    ``lang_stats(TABLE(docs) PARTITION BY lang ORDER BY doc_id)`` — the
    engine shuffles rows by the PARTITION BY key, streams each partition
    through ONE UDTF instance in doc_id order (eval per row), and
    terminate() emits the per-partition summary. This is the API for
    whole-group Python logic that a scalar UDF can't express and
    applyInPandas shouldn't (no need to materialize the group as one
    pandas frame — rows stream through, state stays O(aggregate), here a
    median buffer). Scale: one shuffle on the partition key, same as any
    groupBy; per-instance state is the op's own accumulator, so memory is
    bounded by what the UDTF keeps, not the partition size. The exact
    median needs the value buffer — the honest trade vs an approx sketch."""
    import statistics

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="lang string, n_docs bigint, median_chars double, "
        "first_doc bigint, last_doc bigint"
    )
    class LangStats:
        def __init__(self):
            self._lang = None
            self._chars = []
            self._first = None
            self._last = None

        def eval(self, row):
            self._lang = row["lang"]
            self._chars.append(row["n_chars"])
            if self._first is None:
                self._first = row["doc_id"]
            self._last = row["doc_id"]

        def terminate(self):
            if self._chars:
                yield (
                    self._lang,
                    len(self._chars),
                    float(statistics.median(self._chars)),
                    self._first,
                    self._last,
                )

    spark.udtf.register("bpspark_lang_stats", LangStats)
    table(spark, sf, "documents").createOrReplaceTempView("_udtf_part_docs")
    out = spark.sql(
        """
        SELECT * FROM bpspark_lang_stats(
            TABLE(_udtf_part_docs) PARTITION BY lang ORDER BY doc_id
        )
        """
    )
    return out.orderBy("lang")


@op(
    "udf_sql_declared",
    sql="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS charged
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udf_sql_declared(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-DEFINED scalar functions (Spark 4 ``CREATE FUNCTION ... RETURN
    expr`` — SPARK-44076): business logic declared once in the catalog as
    SQL and reused across queries, with NONE of the Python-UDF cost —
    the body is inlined at resolution time, so the optimizer folds,
    pushes, and codegens it exactly like a hand-written expression (no
    serialization boundary, no Arrow transfer, no Python worker). This
    is the right home for shared semantic definitions (here: TPC-H
    disc_price/charge) on a 100 TB warehouse; the oracle replays the
    inlined arithmetic directly."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bp_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bp_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN bp_disc_price(p, d) * (1 + t)"
    )
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(bp_disc_price(l_extendedprice, l_discount)), 2) AS revenue,
               ROUND(SUM(bp_charge(l_extendedprice, l_discount, l_tax)), 2) AS charged
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )
