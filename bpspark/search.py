"""Full-text retrieval over the document corpus — inverted-index search
and BM25 ranking.

The retrieval layer a training-data platform needs next to ANN
(sim_*): exact keyword search for curation/debugging ("which documents
mention X and Y"), and BM25 — the lexical ranking function production
retrieval (and RAG hybrid search) still leans on — as one declarative
plan. Reference provenance: the reference's only lookup is an
existence probe by ISBN (``MetadataIngestionServiceImpl.java:246-248``);
these ops generalise lookup to content retrieval.

Everything is JVM codegen (split/explode/ln/agg) — no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark.io import table
from bpspark.registry import op

_QUERY_TERMS = ("vector", "merge", "stream")


@op(
    "text_inverted_index_search",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_hits
    FROM tok
    WHERE tok IN {_QUERY_TERMS!r}
    GROUP BY doc_id
    HAVING COUNT(DISTINCT tok) = {len(_QUERY_TERMS)}
    ORDER BY doc_id
    """,
)
def text_inverted_index_search(spark: SparkSession, sf: str) -> DataFrame:
    """Conjunctive (AND) keyword search: documents containing ALL query
    terms, with total hit count. The plan IS the inverted-index probe
    expressed relationally: tokenize → keep only query-term postings
    (the filter cuts the exploded stream to |query| postings lists
    before any shuffle) → group by doc, demanding every distinct term
    present. At 100 TB the explode+filter is a map-only pass whose
    output is bounded by the query terms' document frequencies — the
    same cost profile as probing a materialized inverted index, without
    maintaining one; a served system would persist the (term, doc_id,
    tf) table bucketed by term and this plan's probe stage is unchanged."""
    tok = table(spark, sf, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    return (
        tok.filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct(F.col("tok")).alias("_nt"),
        )
        .filter(F.col("_nt") == len(_QUERY_TERMS))
        .select("doc_id", "n_hits")
        .orderBy("doc_id")
    )


@op(
    "text_bm25_rank",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               SUM(dl) AS tot_len
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM tok WHERE tok IN {_QUERY_TERMS!r}
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * stats.n_docs / stats.tot_len))
                 AS s
        FROM tf
        JOIN df ON tf.tok = df.tok
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id, ROUND(SUM(s), 6) AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_rank(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranking (k1=1.2, b=0.75) of the corpus against the query
    terms — the Okapi formula computed as one declarative plan:
    ln-idf from per-term document frequency, tf saturation with
    length normalization (dl/avgdl folded as dl·N/Σdl so the only
    divisions are per-row, from exact integer aggregates).

    Plan shape: the exploded token stream is cut to the query terms
    BEFORE any aggregation, so tf/df tables are bounded by the terms'
    postings, not the corpus vocabulary; corpus stats (N, total length)
    are a 1-row broadcast; df is a |terms|-row broadcast. The only
    corpus-sized work is tokenize (map-only) + the per-doc length
    aggregate — the same two passes a real index build pays. Top-10 by
    (rounded score, doc_id) is a distributed TakeOrdered, and ranking on
    the ROUND(·,6) value keeps the order decision identical across
    engines (ln last-ulp differences can't flip it)."""
    tok = table(spark, sf, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("tot_len"),
    )
    tf = (
        tok.filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        0.25
                        + 0.75 * F.col("dl") * F.col("n_docs") / F.col("tot_len")
                    )
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )
