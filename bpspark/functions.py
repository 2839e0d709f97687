"""Scalar function families (SURVEY.md §2.3 ``fn_*``).

One registered op per family; each exercises several functions in a single
projection. All JVM-side built-ins (whole-stage codegen) — no Python in the
hot path. Oracle SQL uses the DuckDB spellings where names differ; aliases
match column-for-column.

Cross-engine determinism notes:
- ROUND on doubles: both engines round-half-away on the values produced
  here; avoid manufactured .5 boundaries.
- day-of-week codes differ between engines → not exercised.
- Spark ``split`` keeps trailing empty strings (limit=-1) and DuckDB
  ``string_split`` does too → element access matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark.io import table
from bpspark.registry import op


@op(
    "fn_string",
    sql="""
    SELECT c_custkey,
           c_name || '/' || c_mktsegment AS name_seg,
           substring(c_name, 10, 5) AS name_mid,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           trim('  ' || c_mktsegment || ' ') AS seg_trimmed,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded,
           string_split(c_name, '#')[1] AS name_prefix,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_name, '[0-9]+', 'N') AS name_masked
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf: str) -> DataFrame:
    """String family: concat, substring, case, trim, length, lpad, split,
    regexp_extract (R2 filename-key extraction), regexp_replace (R5 basename
    projection)."""
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("name_seg"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trimmed"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_padded"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
        F.regexp_extract(F.col("c_name"), r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace(F.col("c_name"), r"[0-9]+", "N").alias("name_masked"),
    )


@op(
    "fn_date",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus_30d,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time family (R13 enrichment uses current_timestamp — excluded
    from the oracle-checked projection for determinism, SURVEY §7.4.6).
    DATE-typed outputs are emitted as ISO strings: Spark's DateType arrives
    in pandas as datetime.date while DuckDB's becomes datetime64 — the
    string form is representation-independent for the hash compare."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_2002"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("string").alias("plus_30d"),
        F.to_date("o_orderdate").cast("string").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@op(
    "fn_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_discount, 4) AS disc_amount,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(pow(l_quantity, 2), 2) AS qty_sq,
           ROUND(sqrt(l_extendedprice), 4) AS price_sqrt,
           l_orderkey % 7 AS key_mod,
           CAST(sign(l_quantity - 25.0) AS INTEGER) AS qty_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    """Math family. pmod == % here because operands are non-negative."""
    li = table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        # round at 4dp: the product of two exact-2dp decimals IS a 4dp
        # decimal, so no cross-engine .5-boundary exists at this precision
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_amount"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
    )


@op(
    "fn_conditional",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS price_tier,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           GREATEST(o_totalprice, 50000.0) AS price_floor50k,
           LEAST(o_totalprice, 400000.0) AS price_cap400k
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce/nullif (R6 required-field
    handling), greatest/least."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias("status_filled"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("price_floor50k"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap400k"),
    )


@op(
    "fn_map",
    sql="""
    SELECT doc_id,
           lang AS m_lang,
           source AS m_src,
           2 AS m_size,
           TRUE AS has_lang,
           'lang,src' AS m_keys_csv
    FROM documents
    """,
)
def fn_map(spark: SparkSession, sf: str) -> DataFrame:
    """Map family over the reference's dynamic-metadata type (R4 parse →
    map<string,string>, R12 projection): str_to_map, element_at, map size,
    map_contains_key, sorted map_keys. The map is built from a k=v string
    exactly like a parsed properties record; the oracle checks the
    round-trip against the plain columns."""
    d = table(spark, sf, "documents")
    kv = F.concat(F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source"))
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return d.select(
        "doc_id",
        F.element_at(m, F.lit("lang")).alias("m_lang"),
        F.element_at(m, F.lit("src")).alias("m_src"),
        F.size(m).alias("m_size"),
        F.map_contains_key(m, F.lit("lang")).alias("has_lang"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("m_keys_csv"),
    )


@op(
    "fn_array",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_val,
           ROUND(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), 4) AS head3_sum,
           list_min(embedding) AS vec_min,
           list_max(embedding) AS vec_max,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           list_contains(embedding, 0.0) AS has_zero
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf: str) -> DataFrame:
    """Array family (R3 explode-shape data, NS embeddings): size, indexing,
    slice, min/max, transform+aggregate lambda (sequential double fold —
    matches DuckDB's list_sum order), contains. The slice is digested to a
    scalar sum: float-array cells would make the driver's value-hash depend
    on engine float-formatting; scalars compare exactly."""
    e = table(spark, sf, "embeddings")
    emb = F.col("embedding")

    def fold_sum(arr):
        return F.aggregate(
            F.transform(arr, lambda x: x.cast("double")), F.lit(0.0), lambda acc, x: acc + x
        )

    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.round(fold_sum(F.slice(emb, 1, 3)), 4).alias("head3_sum"),
        F.array_min(emb).alias("vec_min"),
        F.array_max(emb).alias("vec_max"),
        F.round(fold_sum(emb), 4).alias("vec_sum"),
        F.array_contains(emb, F.lit(0.0).cast("float")).alias("has_zero"),
    )


@op(
    "fn_json",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf: str) -> DataFrame:
    """JSON family over events.props (a JSON object string): path extraction
    as string, typed cast via from_json, and missing-key null semantics."""
    e = table(spark, sf, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@op(
    "fn_explode_unnest",
    sql="""
    SELECT vec_id, UNNEST(embedding) AS component
    FROM embeddings WHERE vec_id < 50
    """,
)
def fn_explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """R3 core shape: explode an array column to one row per element (the
    ZIP-entry unnest). Generator runs inside codegen — no shuffle."""
    e = table(spark, sf, "embeddings")
    return (
        e.filter(F.col("vec_id") < 50)
        .select("vec_id", F.explode("embedding").alias("component"))
    )


@op(
    "fn_arrays_zip",
    sql="""
    SELECT vec_id, unnest(range(4)) AS pos,
           CAST(unnest(embedding[1:4]) AS DOUBLE) AS x,
           CAST(unnest(embedding[5:8]) AS DOUBLE) AS y
    FROM embeddings
    """,
)
def fn_arrays_zip(spark: SparkSession, sf: str) -> DataFrame:
    """Positional zip of two array columns into array<struct> and flatten:
    arrays_zip + posexplode (DuckDB oracle: parallel unnest, which zips by
    position). The struct-field path (z.x / z.y) exercises nested-type
    projection; float->double widening is exact so values hash identically.
    Stays entirely in codegen'd JVM expressions — at 100 TB this is a
    narrow map-side transform, no shuffle."""
    emb = table(spark, sf, "embeddings")
    z = emb.select(
        "vec_id",
        F.arrays_zip(
            F.slice("embedding", 1, 4).alias("x"),
            F.slice("embedding", 5, 4).alias("y"),
        ).alias("z"),
    )
    return z.select(
        "vec_id",
        F.posexplode("z").alias("pos", "s"),
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("s.x").cast("double").alias("x"),
        F.col("s.y").cast("double").alias("y"),
    )


@op(
    "fn_array_hof",
    sql="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           len(list_filter(embedding, x -> abs(x) > 0.5)) > 0 AS has_big,
           len(list_filter(embedding, x -> NOT (abs(x) < 10))) = 0 AS all_small,
           ROUND(list_sum(list_transform(
               list_filter(embedding, x -> x > 0),
               x -> CAST(x AS DOUBLE))), 6) AS sum_pos
    FROM embeddings
    ORDER BY vec_id
    """,
)
def fn_array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions — filter / exists / forall / aggregate
    lambdas over the embedding column, all JVM-side codegen (no Python).
    DuckDB expresses exists/forall via list_filter lengths. sum_pos is a
    sequential left fold in both engines (same order ⇒ bit-identical),
    rounded at 6dp. Map-only at any scale."""
    e = table(spark, sf, "embeddings").select("vec_id", "embedding")
    pos = F.filter("embedding", lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).alias("n_pos"),
        F.exists("embedding", lambda x: F.abs(x) > 0.5).alias("has_big"),
        F.forall("embedding", lambda x: F.abs(x) < 10).alias("all_small"),
        F.round(
            F.aggregate(pos, F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double")),
            6,
        ).alias("sum_pos"),
    ).orderBy("vec_id")


@op(
    "fn_map_transform",
    sql="""
    SELECT doc_id,
           upper(lang) AS up_lang,
           1 AS n_kept,
           'lang=' || lang || ';src=' || source AS entries_csv  -- sorted entry order: lang < src
    FROM documents
    ORDER BY doc_id
    """,
)
def fn_map_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Map higher-order functions over the dynamic-metadata type:
    transform_values (uppercase every value), map_filter (keep one key),
    and a deterministic map→string serialization via sorted map_entries.
    The oracle checks each result against the plain source columns the
    map was built from (same round-trip strategy as fn_map). All JVM
    expressions — map HOFs are interpreted (CodegenFallback) but stay
    off the hot path: this is metadata-projection work, not fact-scan
    work."""
    d = table(spark, sf, "documents")
    kv = F.concat(F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source"))
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    upper_m = F.transform_values(m, lambda k, v: F.upper(v))
    kept = F.map_filter(m, lambda k, v: k == F.lit("lang"))
    entries = F.array_sort(F.map_entries(m))
    entries_csv = F.array_join(
        F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ";",
    )
    return d.select(
        "doc_id",
        F.element_at(upper_m, F.lit("lang")).alias("up_lang"),
        F.size(kept).alias("n_kept"),
        entries_csv.alias("entries_csv"),
    ).orderBy("doc_id")


@op(
    "fn_url_parse",
    sql="""
    SELECT doc_id,
           source || '.example.com'                    AS url_host,
           '/' || lang || '/doc/' || doc_id            AS url_path,
           lang                                        AS url_ref,
           'https'                                     AS url_proto
    FROM documents
    ORDER BY doc_id
    """,
)
def fn_url_parse(spark: SparkSession, sf: str) -> DataFrame:
    """URL component extraction (parse_url HOST/PATH/QUERY/PROTOCOL) — the
    web-corpus normalization primitive (crawl dedup keys on host+path).
    The URL is synthesized from the row's own columns, so the oracle
    checks the parse round-trip against the plain inputs (fn_map
    strategy). parse_url is a JVM expression; no Python."""
    d = table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id"),
        F.lit("?ref="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("url_ref"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("url_proto"),
    ).orderBy("doc_id")


@op(
    "fn_aes_roundtrip",
    sql="""
    SELECT c_custkey, c_name AS decrypted_name FROM customer
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Column-level encryption roundtrip: aes_encrypt (AES-GCM, random IV
    per row) then aes_decrypt with the same 16-byte key recovers the
    plaintext exactly — the identity oracle proves the crypto pair is
    lossless. Both functions are JVM codegen expressions, so PII-column
    encryption at rest costs one projection, no shuffle, no Python.
    (Ciphertext itself is never oracle-compared: GCM's random IV makes
    it intentionally non-deterministic.)"""
    c = table(spark, sf, "customer")
    key = F.lit("0123456789abcdef")
    return c.select(
        "c_custkey",
        F.aes_decrypt(F.aes_encrypt(F.col("c_name"), key), key)
        .cast("string")
        .alias("decrypted_name"),
    )


@op(
    "reshape_nest_unnest",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def reshape_nest_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """Denormalize→renormalize roundtrip: lineitems nest into a per-order
    array<struct> (sorted by linenumber for determinism), then explode
    back to rows — the identity oracle proves the nesting is lossless.
    This is the document-store reshape (one order = one record with its
    lines embedded) used to feed training-data writers and JSON sinks;
    one shuffle to group, codegen explode to flatten."""
    li = (
        table(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("lines")
    )
    return nested.select(
        "l_orderkey", F.explode("lines").alias("ln")
    ).select(
        "l_orderkey",
        F.col("ln.l_linenumber").alias("l_linenumber"),
        F.col("ln.l_quantity").alias("l_quantity"),
    )


@op(
    "fn_null_semantics",
    sql="""
    SELECT o_orderkey,
           (o_orderstatus IS NOT DISTINCT FROM o_orderpriority) AS nullsafe_eq,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority, 'none') AS first_defined,
           (NULL AND FALSE) IS NULL AS sql_3vl_and
    FROM orders
    """,
)
def fn_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """SQL NULL semantics surfaced explicitly: null-safe equality (<=> /
    IS NOT DISTINCT FROM), NULLIF, COALESCE chains, and one
    three-valued-logic probe (NULL AND FALSE = FALSE, so IS NULL on it
    is false — the asymmetric Kleene case engines get subtly wrong).
    All pure codegen projections."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").eqNullSafe(F.col("o_orderpriority")).alias("nullsafe_eq"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.col("o_orderpriority"),
            F.lit("none"),
        ).alias("first_defined"),
        (F.lit(None).cast("boolean") & F.lit(False)).isNull().alias("sql_3vl_and"),
    )


@op(
    "fn_array_setops",
    sql="""
    WITH b AS (
      SELECT o_orderpriority AS pri,
             list_sort(list(DISTINCT o_orderstatus)) AS statuses
      FROM orders GROUP BY o_orderpriority
    ), p AS (
      SELECT a.pri AS pri_a, c.pri AS pri_b, a.statuses AS sa, c.statuses AS sb
      FROM b a JOIN b c ON a.pri < c.pri
    )
    SELECT pri_a, pri_b,
           len(list_intersect(sa, sb)) AS n_common,
           array_to_string(list_sort(list_intersect(sa, sb)), ',') AS common_csv,
           len(list_filter(sa, x -> NOT list_contains(sb, x))) AS n_only_a,
           len(list_distinct(list_concat(sa, sb))) AS n_union,
           list_has_any(sa, sb) AS overlaps
    FROM p
    """,
)
def fn_array_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra (union/intersect/except/overlap) over per-group
    distinct-value arrays, emitted as SCALARS (sizes, CSV of the sorted
    intersection, boolean overlap) — array-typed cells never cross the
    oracle boundary (pandas vs duckdb list repr differ; round-1 rule).
    Set ops run on deduped per-group arrays (|statuses| ≤ 3), so the
    pairwise frame is |priorities|² tiny regardless of fact size."""
    o = table(spark, sf, "orders")
    b = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.array_sort(F.collect_set("o_orderstatus")).alias("statuses")
    )
    a, c = b.alias("a"), b.alias("c")
    p = a.join(c, F.col("a.pri") < F.col("c.pri")).select(
        F.col("a.pri").alias("pri_a"),
        F.col("c.pri").alias("pri_b"),
        F.col("a.statuses").alias("sa"),
        F.col("c.statuses").alias("sb"),
    )
    inter = F.array_intersect("sa", "sb")
    return p.select(
        "pri_a",
        "pri_b",
        F.size(inter).alias("n_common"),
        F.array_join(F.array_sort(inter), ",").alias("common_csv"),
        F.size(F.array_except("sa", "sb")).alias("n_only_a"),
        F.size(F.array_distinct(F.array_union("sa", "sb"))).alias("n_union"),
        F.arrays_overlap("sa", "sb").alias("overlaps"),
    )


@op(
    "fn_try_arith",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
           CASE WHEN o_orderkey > 7 THEN NULL
                ELSE 9223372036854775800 + o_orderkey END AS safe_add,
           CASE WHEN o_orderstatus = 'O' THEN CAST(NULL AS DOUBLE)
                ELSE 1.5 END AS safe_parse
    FROM orders
    """,
)
def fn_try_arith(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: try_divide / try_add / try_to_number
    return NULL where strict ANSI evaluation would THROW (division by
    zero, bigint overflow, unparseable numeric) — the per-row quarantine
    that keeps a 100 TB job from dying on one poison row. The oracle
    proves each NULL appears exactly where the failure condition holds
    (DuckDB emulates with lazily-evaluated CASE guards)."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
        F.try_add(F.lit(9223372036854775800), F.col("o_orderkey")).alias("safe_add"),
        F.try_to_number(
            F.when(F.col("o_orderstatus") == "O", "oops").otherwise("1.5"),
            F.lit("9.9"),
        )
        .cast("double")
        .alias("safe_parse"),
    )


@op(
    "fn_trig",
    sql="""
    SELECT c_custkey,
           round(sin(c_acctbal / 1000.0), 6) AS sin_v,
           round(cos(c_acctbal / 1000.0), 6) AS cos_v,
           round(atan2(c_acctbal, CAST(c_custkey AS DOUBLE) + 1.0), 6) AS atan2_v,
           round(radians(CAST(c_custkey % 360 AS DOUBLE)), 6) AS rad_v,
           round(degrees(c_acctbal / 10000.0), 6) AS deg_v,
           round(atan(c_acctbal / 5000.0), 6) AS atan_v
    FROM customer
    """,
)
def fn_trig(spark: SparkSession, sf: str) -> DataFrame:
    """Trigonometric scalar family (sin/cos/atan/atan2/radians/degrees) —
    all JVM intrinsics inside one whole-stage-codegen projection, no
    Python. Results rounded to 6 dp: both engines evaluate IEEE-double
    libm on identical inputs, so post-round values agree (boundary drift
    would need a true value within 1e-15 of a rounding edge)."""
    c = table(spark, sf, "customer")
    x = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.sin(x / 1000.0), 6).alias("sin_v"),
        F.round(F.cos(x / 1000.0), 6).alias("cos_v"),
        F.round(F.atan2(x, F.col("c_custkey").cast("double") + 1.0), 6).alias("atan2_v"),
        F.round(F.radians((F.col("c_custkey") % 360).cast("double")), 6).alias("rad_v"),
        F.round(F.degrees(x / 10000.0), 6).alias("deg_v"),
        F.round(F.atan(x / 5000.0), 6).alias("atan_v"),
    )


@op(
    "fn_iso8601_duration",
    sql="""
    SELECT o_orderkey,
           'PT' || CAST(o_orderkey % 12 AS VARCHAR) || 'H'
                || CAST(o_orderkey % 60 AS VARCHAR) || 'M' AS iso_duration,
           (o_orderkey % 12) * 3600 + (o_orderkey % 60) * 60 AS total_s,
           o_orderdate
             + to_hours(o_orderkey % 12)
             + to_minutes(o_orderkey % 60) AS deadline
    FROM orders
    """,
)
def fn_iso8601_duration(spark: SparkSession, sf: str) -> DataFrame:
    """ISO-8601 duration parsing + timestamp arithmetic. The reference
    carries workflow timers as ISO-8601 strings like ``PT5M``/``PT1M``
    (alfresco-global.properties:17-19, injected into process variables at
    MetadataIngestionServiceImpl.java:243-244); the engine parses them
    with codegen regexps into a DayTimeIntervalType and computes typed
    deadlines (timestamp + make_dt_interval). No UDF: parse → interval →
    add is one codegen projection, so it survives any scale."""
    o = table(spark, sf, "orders")
    iso = F.concat(
        F.lit("PT"),
        (F.col("o_orderkey") % 12).cast("string"),
        F.lit("H"),
        (F.col("o_orderkey") % 60).cast("string"),
        F.lit("M"),
    )
    w = o.withColumn("iso_duration", iso)
    hours = F.coalesce(
        F.regexp_extract("iso_duration", r"(\d+)H", 1).cast("long"), F.lit(0)
    )
    mins = F.coalesce(
        F.regexp_extract("iso_duration", r"(\d+)M", 1).cast("long"), F.lit(0)
    )
    return w.select(
        "o_orderkey",
        "iso_duration",
        (hours * 3600 + mins * 60).alias("total_s"),
        (
            F.col("o_orderdate")
            + F.make_dt_interval(F.lit(0), hours.cast("int"), mins.cast("int"))
        ).alias("deadline"),
    )


@op(
    "fn_format_output",
    sql="""
    SELECT o_orderkey,
           printf('ORD-%08d', o_orderkey) AS order_tag,
           printf('%s:%d', o_orderstatus, o_orderkey % 100) AS status_code,
           printf('%.1f', round(o_totalprice, 1)) AS price_1dp,
           repeat(o_orderstatus, 3) AS status_x3,
           reverse(o_orderpriority) AS pri_rev,
           translate(o_orderpriority, '-AEIOU', '_') AS pri_smashed,
           left(o_orderpriority, 3) AS pri_l3,
           right(o_orderpriority, 4) AS pri_r4,
           ascii(o_orderstatus) AS status_ascii,
           chr(65 + CAST(o_orderkey % 26 AS INTEGER)) AS bucket_chr
    FROM orders
    """,
)
def fn_format_output(spark: SparkSession, sf: str) -> DataFrame:
    """printf-style formatting family: format_string (Java Formatter ≡ C
    printf for %d/%s and for %.1f of pre-rounded values — the half-up vs
    half-even divergence needs an exact mid-boundary digit, which
    round(x,1) removes), repeat/reverse/translate/left/right/ascii/chr.
    Pure codegen string kernels — formatting 100 TB of rows never leaves
    the JVM."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%08d", "o_orderkey").alias("order_tag"),
        F.format_string(
            "%s:%d", F.col("o_orderstatus"), F.col("o_orderkey") % 100
        ).alias("status_code"),
        F.format_string("%.1f", F.round("o_totalprice", 1)).alias("price_1dp"),
        F.repeat("o_orderstatus", 3).alias("status_x3"),
        F.reverse("o_orderpriority").alias("pri_rev"),
        F.translate("o_orderpriority", "-AEIOU", "_").alias("pri_smashed"),
        F.substring("o_orderpriority", 1, 3).alias("pri_l3"),
        F.expr("right(o_orderpriority, 4)").alias("pri_r4"),
        F.ascii("o_orderstatus").alias("status_ascii"),
        F.chr(F.lit(65) + (F.col("o_orderkey") % 26)).alias("bucket_chr"),
    )


@op(
    "fn_struct_field_surgery",
    sql="""
    SELECT o_orderkey,
           o_totalprice AS original_price,
           ROUND(o_totalprice * 1.1, 2) AS adjusted_price,
           o_orderpriority AS meta_priority,
           CAST(NULL AS VARCHAR) AS dropped_status
    FROM orders WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
)
def fn_struct_field_surgery(spark: SparkSession, sf: str) -> DataFrame:
    """Nested-struct FIELD SURGERY (``withField`` / ``dropFields``) — the
    document-store update primitives: build a nested order struct,
    UPDATE one inner field in place (adjusted price), DROP another
    (status), and read scalars back out. Without withField, updating one
    nested field means re-spelling the entire struct — unmaintainable on
    the deep schemas real event/document data has. All codegen
    projections, zero shuffles; the oracle states the flattened result
    (the dropped field reads back as NULL via a safe try access)."""
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") % 100 == 0)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
            F.struct(F.col("o_orderpriority").alias("priority")).alias("meta"),
        ).alias("order_doc"),
    )
    surgically = nested.withColumn(
        "order_doc",
        F.col("order_doc")
        .withField("adjusted", F.round(F.col("order_doc.price") * 1.1, 2))
        .dropFields("status"),
    )
    # the drop is structural: 'status' must be gone from the schema, not
    # just nulled — asserted here so the op self-checks the surgery
    fields = [f.name for f in surgically.schema["order_doc"].dataType.fields]
    if "status" in fields or "adjusted" not in fields:
        # survives python -O (r11 review: bare asserts are stripped)
        raise RuntimeError(f"struct surgery failed: {fields}")
    return surgically.select(
        "o_orderkey",
        F.col("order_doc.price").alias("original_price"),
        F.col("order_doc.adjusted").alias("adjusted_price"),
        F.col("order_doc.meta.priority").alias("meta_priority"),
        F.lit(None).cast("string").alias("dropped_status"),
    ).orderBy("o_orderkey")
