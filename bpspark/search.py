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


def _bm25_oracle(terms: tuple[str, ...]) -> str:
    """Whole-corpus BM25 DuckDB oracle (k1=1.2, b=0.75, top-10) — the
    single source of truth for every BM25-family op's certification SQL,
    parameterized only by the query-terms tuple. text_bm25_rank keeps an
    inline copy to preserve its driver-certified source hash
    (tools/stale_ops.py hashes getsource incl. the decorator); a test
    pins that copy byte-identical to this builder so the formula can
    never silently de-sync across ops."""
    return f"""
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
        FROM tok WHERE tok IN {terms!r}
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
    """


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


_RRF_K = 60       # standard RRF dampening constant (Cormack et al. 2009)
_RRF_TOPC = 20    # candidates taken from each retriever before fusion
_RRF_QVEC = 0     # vec_id whose embedding is the dense query


@op(
    "search_hybrid_rrf",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS tot_len FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM tok WHERE tok IN {_QUERY_TERMS!r}
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    bm25 AS (
        SELECT tf.doc_id, ROUND(SUM(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * stats.n_docs / stats.tot_len))
               ), 6) AS s
        FROM tf
        JOIN df ON tf.tok = df.tok
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
        FROM (SELECT * FROM bm25 ORDER BY s DESC, doc_id LIMIT {_RRF_TOPC})
    ),
    q AS (
        SELECT embedding AS qe,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
        FROM embeddings WHERE vec_id = {_RRF_QVEC}
    ),
    cos AS (
        SELECT vec_id AS doc_id,
               ROUND(list_sum(list_transform(list_zip(embedding, q.qe),
                     t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qn), 6) AS s
        FROM embeddings CROSS JOIN q
        WHERE vec_id <> {_RRF_QVEC}
    ),
    den AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
        FROM (SELECT * FROM cos ORDER BY s DESC, doc_id LIMIT {_RRF_TOPC})
    )
    SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K} + lex.r), 0)
               + COALESCE(1.0 / ({_RRF_K} + den.r), 0), 6) AS rrf
    FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009,
    the fusion rule behind most production BM25+vector search): the
    lexical leg is the BM25 plan above, the dense leg is cosine
    similarity against one query embedding, each leg keeps its top-20 via
    distributed TakeOrdered, ranks are assigned WITHIN those bounded
    candidate sets (40 rows — window cost is nil and deterministic:
    6dp-rounded score then doc_id), and RRF sums 1/(60+rank) across legs
    through a full outer join.

    100 TB shape: each retriever leg is already scale-correct on its own
    (BM25: postings-bounded aggregates + TakeOrdered; dense: broadcast
    query, map-only cosine, TakeOrdered — or the IVF index for bigger
    query sets); fusion only ever touches 2×top-C rows. This is the
    standard architecture: retrievers narrow, fusion is O(candidates).
    Rank-based fusion also sidesteps cross-leg score calibration — why
    RRF beats score interpolation without tuning."""
    docs = table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
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
    bm25 = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") * F.col("n_docs") / F.col("tot_len")))
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_RRF_TOPC)
    )
    from pyspark.sql.window import Window

    lex = bm25.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("s").desc(), "doc_id"))
        .alias("r_lex"),
    )

    e = table(spark, sf, "embeddings")
    sq = lambda c: F.aggregate(  # noqa: E731 — sequential fold ≡ DuckDB list_sum
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    q = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("embedding").alias("qe"), F.sqrt(sq(F.col("embedding"))).alias("qn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qe"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = (
        e.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (F.sqrt(sq(F.col("embedding"))) * F.col("qn")), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_RRF_TOPC)
    )
    den = cos.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("s").desc(), "doc_id"))
        .alias("r_den"),
    )
    fused = (
        lex.join(den, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("r_den")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )
    return fused


_INC_QUERY_TERMS = ("hash", "join", "filter")


def _bm25_tokenize(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))


def _bm25_build_segment(d: DataFrame, seg_dir: str) -> None:
    """Materialize one index SEGMENT from a document batch — the Lucene
    segment model on a lake: per-segment postings (tok, doc_id, tf) sorted
    by term (term-range row-group skipping stands in for postings-list
    locality), per-doc lengths, the segment's term→df table, and a 1-row
    stats sidecar. Everything is integer-exact, so cross-segment merge is
    plain addition — the property the incremental≡recompute proof rests on."""
    tok = _bm25_tokenize(d)
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf.sortWithinPartitions("tok").write.mode("overwrite").parquet(f"{seg_dir}/postings")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dl.write.mode("overwrite").parquet(f"{seg_dir}/doclens")
    tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).write.mode(
        "overwrite"
    ).parquet(f"{seg_dir}/df")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_len")
    ).coalesce(1).write.mode("overwrite").parquet(f"{seg_dir}/stats")


def _bm25_query_segments(
    spark: SparkSession, seg_dirs: list[str], terms: list[str]
) -> DataFrame:
    """BM25 top-10 answered purely from on-disk index segments — the
    shared read path of search_bm25_incremental (N live segments) and
    search_bm25_segment_merge (1 compacted segment; a merged segment IS
    a segment, so the same plan serves both). Per-segment df tables are
    filtered to the query terms then summed (|terms| rows, broadcast);
    stats sidecars summed (1 row, broadcast); postings filtered by a
    pushed parquet predicate over term-sorted files; doc lengths joined
    for candidates only. Score arithmetic is identical to
    text_bm25_rank (per-row divisions off exact integer partials, rank
    on ROUND(·,6))."""
    postings = spark.read.parquet(*[f"{s}/postings" for s in seg_dirs]).filter(
        F.col("tok").isin(*terms)
    )
    dl = spark.read.parquet(*[f"{s}/doclens" for s in seg_dirs])
    df = (
        spark.read.parquet(*[f"{s}/df" for s in seg_dirs])
        .filter(F.col("tok").isin(*terms))
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
    )
    stats = spark.read.parquet(*[f"{s}/stats" for s in seg_dirs]).agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        F.sum("tot_len").alias("tot_len"),
    )
    scored = (
        postings.join(F.broadcast(df), "tok")
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


def _bm25_merge_segments(
    spark: SparkSession, seg_dirs: list[str], merged_dir: str
) -> None:
    """Consolidate N index segments into ONE by pure segment-file
    arithmetic — Lucene's segment merge on the lake. Documents are NEVER
    re-tokenized: postings union (doc sets are disjoint by the segment
    contract) and re-sort by term; per-term df tables SUM; per-doc
    lengths union; stats sidecars SUM. Every statistic is an integer
    partial, so the merged segment's tables are byte-equivalent in
    content to an index built from the union corpus — which is exactly
    what the op's oracle proves. Output layout = the segment layout, so
    a merged segment is itself mergeable (closure under merge — Lucene's
    tiered-compaction invariant).

    Scale: merge cost ∝ merged postings rows (one shuffle to re-sort by
    term + three map-side unions/sums); `_MERGE_OUT_FILES` is the
    corpus-proportional output-file knob (1 at test SF; thousands at
    100 TB via repartitionByRange on term so row-group skipping
    survives compaction)."""
    postings = spark.read.parquet(*[f"{s}/postings" for s in seg_dirs])
    (
        postings.repartitionByRange(_MERGE_OUT_FILES, "tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{merged_dir}/postings")
    )
    spark.read.parquet(*[f"{s}/doclens" for s in seg_dirs]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{merged_dir}/doclens")
    (
        spark.read.parquet(*[f"{s}/df" for s in seg_dirs])
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .repartitionByRange(_MERGE_OUT_FILES, "tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{merged_dir}/df")
    )
    (
        spark.read.parquet(*[f"{s}/stats" for s in seg_dirs])
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("tot_len").alias("tot_len"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{merged_dir}/stats")
    )


_MERGE_OUT_FILES = 1
_MERGE_QUERY_TERMS = ("scan", "batch", "column")


@op("search_bm25_segment_merge", sql=_bm25_oracle(_MERGE_QUERY_TERMS))
def search_bm25_segment_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Segment MERGE/compaction — the other half of the index lifecycle
    search_bm25_incremental opens (append creates segments; merge
    consolidates them, Lucene's tiered-compaction step): two segments are
    built from disjoint corpus halves, merged into ONE segment by pure
    segment-file arithmetic (_bm25_merge_segments — documents are never
    re-tokenized; postings/doclens union, df/stats sum), and the query is
    answered from the single merged segment.

    Correctness: because every BM25 statistic is an integer partial,
    merge-then-query must equal a whole-corpus rebuild EXACTLY — the
    DuckDB oracle is the full-corpus BM25 (merged ≡ rebuilt, hash-proven;
    the same certification pattern as the incremental op, now covering
    the compaction direction). Tests additionally pin what the oracle
    can't see: merged-segment query ≡ multi-segment query row-for-row,
    merge reads only segment files (no documents scan in its plans), and
    source segments are byte-untouched by the merge (mtime-pinned).

    100 TB shape: merge cost ∝ merged postings rows — one
    repartitionByRange shuffle on term keeps the merged files term-sorted
    so row-group skipping survives compaction (`_MERGE_OUT_FILES` scales
    the output fan-out); query cost after the merge is the same
    postings-bounded plan, now over 1 segment's worth of file metadata
    instead of N — which is the point of compacting. Merged index
    persists via versioned state_dir; re-runs answer from it
    (idempotent `_built` marker)."""
    import os as _os

    from bpspark.io import state_dir

    d = table(spark, sf, "documents").select("doc_id", "text")
    idx = state_dir("bm25merge", sf)
    segs = [f"{idx}/seg=0", f"{idx}/seg=1"]
    merged = f"{idx}/merged"
    if not _os.path.isdir(f"{idx}/_built"):
        _bm25_build_segment(d.filter(F.pmod("doc_id", F.lit(5)) != 0), segs[0])
        _bm25_build_segment(d.filter(F.pmod("doc_id", F.lit(5)) == 0), segs[1])
        _bm25_merge_segments(spark, segs, merged)
        _os.makedirs(f"{idx}/_built", exist_ok=True)
    return _bm25_query_segments(spark, [merged], list(_MERGE_QUERY_TERMS))


@op("search_bm25_incremental", sql=_bm25_oracle(_INC_QUERY_TERMS))
def search_bm25_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """INCREMENTAL inverted-index maintenance + BM25 over merged segments —
    the production search shape (Lucene's segment model; text_bm25_rank is
    the one-shot form): the base corpus (doc_id % 5 != 0) is indexed once
    into segment 0, a later document batch (doc_id % 5 == 0) is APPENDED
    as segment 1 without touching segment 0, and the query plan merges
    segments at read time. Because every per-segment statistic BM25 needs
    is an integer partial (tf per (doc,term); df, n_docs, Σdl per
    segment), cross-segment merge is plain addition and the merged scores
    equal a full-corpus rebuild EXACTLY — so the DuckDB oracle is the
    whole-corpus BM25 (incremental ≡ recompute, hash-proven, the same
    certification pattern as sim_incremental_topk vs brute force).

    Query plan: per-segment df tables filtered to the query terms →
    summed (|terms| rows); stats sidecars summed (1 row, broadcast);
    postings filtered to the terms — the filter is a pushed parquet
    predicate, and each segment's postings are term-sorted so row-group
    min/max skipping reads ~only the probed terms' ranges (the lake
    stand-in for postings-list locality); doc lengths joined for the
    candidates only. Score arithmetic is identical to text_bm25_rank
    (per-row divisions off exact integer aggregates, rank on ROUND(·,6)).

    100 TB shape: indexing cost per batch ∝ batch tokens (two map-side
    aggregates + sorted write) — the base corpus is NEVER re-tokenized;
    query cost ∝ the probed terms' postings across segments, not corpus
    size; segment compaction (many → few) is sink_compact_small_files'
    job and changes no statistic. Segments persist via versioned
    state_dir; a re-run reuses them (idempotent `_built` marker), which
    doubles as the fresh-reader path: the second sweep pass answers the
    query purely from the on-disk index."""
    import os as _os

    from bpspark.io import state_dir

    d = table(spark, sf, "documents").select("doc_id", "text")
    idx = state_dir("bm25seg", sf)
    segs = [f"{idx}/seg=0", f"{idx}/seg=1"]
    if not _os.path.isdir(f"{idx}/_built"):
        _bm25_build_segment(d.filter(F.pmod("doc_id", F.lit(5)) != 0), segs[0])
        _bm25_build_segment(d.filter(F.pmod("doc_id", F.lit(5)) == 0), segs[1])
        _os.makedirs(f"{idx}/_built", exist_ok=True)

    return _bm25_query_segments(spark, segs, list(_INC_QUERY_TERMS))


# ---------------------------------------------------------------------------
# RAG context assembly under a token budget
# ---------------------------------------------------------------------------

_RAG_CONTEXT_BUDGET_TOKENS = 600


@op(
    "rag_context_pack",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT tok AS query, doc_id, COUNT(*) AS tf
        FROM tok WHERE tok IN {_QUERY_TERMS!r}
        GROUP BY 1, 2
    ),
    dl AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT tf.query, tf.doc_id, tf.tf, dl.n_tokens,
               ROW_NUMBER() OVER (PARTITION BY tf.query
                                  ORDER BY tf.tf DESC, tf.doc_id) AS rnk,
               CAST(SUM(dl.n_tokens) OVER (PARTITION BY tf.query
                                           ORDER BY tf.tf DESC, tf.doc_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
        FROM tf JOIN dl ON tf.doc_id = dl.doc_id
    )
    SELECT query, doc_id, tf, rnk, n_tokens, cum_tokens
    FROM ranked WHERE cum_tokens <= {_RAG_CONTEXT_BUDGET_TOKENS}
    """,
)
def rag_context_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budgeted CONTEXT ASSEMBLY — the serving stage between
    retrieval and the language model: for each query, candidate documents
    are taken in relevance order and packed into the prompt until the
    next document would overflow the context budget (600 tokens here).
    This op certifies the PACKING stage; relevance is deliberately the
    simplest hash-verifiable signal (per-term tf, ties to doc_id) so the
    whole row set stays integer-exact — in production the score column
    is text_bm25_rank / search_hybrid_rrf output and the packing plan
    below is UNCHANGED (it never looks at how the score was made).

    Semantics: prefix packing (top-scored docs until the budget is hit),
    the standard RAG context-window fill; a skip-and-continue bin-packer
    is doc_pack_greedy's shape, deliberately not duplicated here.

    Plan: the exploded token stream is cut to the query terms BEFORE any
    shuffle (postings-bounded tf, exactly the inverted-index probe
    shape); doc lengths are a MAP-ONLY projection (size(split()) — the
    corpus is never exploded a second time) joined to candidates only;
    the rank + running-sum windows share one (query)-partitioned sort,
    over |candidates| rows, never the corpus. All-integer output — exact
    cross-engine. At 100 TB: one tokenize pass bounded by the probed
    terms' document frequencies + one map-only length projection; the
    per-query window state is the candidate list, thousands of rows at
    web scale, so packing itself is effectively free next to retrieval.

    Reference provenance: generalises the reference's assemble-then-act
    batching (MetadataIngestionServiceImpl.java:154-170 builds bounded
    work batches before acting) to prompt assembly.
    """
    d = table(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    tf = (
        tok.filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy(F.col("tok").alias("query"), "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = d.select("doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tokens"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(F.col("tf").desc(), "doc_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tf.join(dl, "doc_id")
        .select(
            "query",
            "doc_id",
            "tf",
            "n_tokens",
            F.row_number().over(w).alias("rnk"),
            F.sum("n_tokens").over(cum).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= _RAG_CONTEXT_BUDGET_TOKENS)
        .select("query", "doc_id", "tf", "rnk", "n_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# cross-encoder rerank over the hybrid candidate set
# ---------------------------------------------------------------------------

_CE_ALPHA = 0.1  # weight of the dampened-tf term relative to term coverage


def _ce_score_batches(terms: tuple):
    """mapInPandas scorer — the cross-encoder INFERENCE SEAM. In a real
    deployment this body is an ONNX/torch cross-encoder forward pass
    over (query, passage) pairs; the Arrow batch transfer, the
    (doc_id, rrf, text) -> (doc_id, rrf, ce_raw) schema, and the
    candidates-only batch shape are the production contract and are
    exercised for real. The stand-in scorer is a deterministic
    relevance feature over the SAME pair input a model would see:
    coverage (matched query terms / |terms|) + 0.1 * sum_t ln(1+tf_t),
    computed with the exact IEEE op order the DuckDB oracle replays
    (left-to-right term folds; ln(1+tf) on exact integers)."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            cov, damp = [], []
            for text in pdf["text"]:
                toks = text.lower().split(" ")
                matched, s = 0, 0.0
                for t in terms:
                    tf = toks.count(t)
                    if tf:
                        matched += 1
                    s += float(np.log(1.0 + tf))
                cov.append(matched / len(terms))
                damp.append(s)
            out = pdf[["doc_id", "rrf"]].copy()
            out["ce_raw"] = [c + _CE_ALPHA * d for c, d in zip(cov, damp)]
            yield out

    return fn


def _ce_rerank_oracle_sql() -> str:
    """Full-replication oracle for search_crossencoder_rerank: the
    registered search_hybrid_rrf oracle produces the candidate set, the
    stand-in scorer replays as explicit per-term folds (same IEEE
    order), tie-free 6dp quantization, rerank by (ce DESC, rrf DESC,
    doc_id)."""
    from bpspark.registry import _REGISTRY

    rrf_sql = _REGISTRY["search_hybrid_rrf"].sql
    tfs = ",\n           ".join(
        f"len(list_filter(string_split(lower(d.text), ' '), x -> x = '{t}'))"
        f" AS tf{i}"
        for i, t in enumerate(_QUERY_TERMS)
    )
    matched = " + ".join(
        f"CAST(tf{i} > 0 AS INT)" for i in range(len(_QUERY_TERMS))
    )
    lnsum = " + ".join(f"ln(1 + tf{i})" for i in range(len(_QUERY_TERMS)))
    return f"""WITH cand AS ({rrf_sql}),
feat AS (
  SELECT c.doc_id, c.rrf,
           {tfs}
  FROM cand c JOIN documents d ON d.doc_id = c.doc_id
),
ce AS (
  SELECT doc_id, rrf,
         floor((CAST(({matched}) AS DOUBLE) / {len(_QUERY_TERMS)}
                + CAST(0.1 AS DOUBLE) * ({lnsum})) * 1e6 + 0.5) / 1e6
           AS ce_score
  FROM feat
)
SELECT doc_id, rrf, ce_score,
       ROW_NUMBER() OVER (ORDER BY ce_score DESC, rrf DESC, doc_id)
         AS rank_ce
FROM ce
ORDER BY rank_ce"""


@op("search_crossencoder_rerank", sql=_ce_rerank_oracle_sql())
def search_crossencoder_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieve-then-rerank, the production serving ladder's last stage:
    search_hybrid_rrf narrows the corpus to 10 candidates, then a
    cross-encoder-shaped scorer reads each (query, passage) PAIR and
    re-orders them. Retrievers are cheap and pair-blind; cross-encoders
    are expensive and pair-aware — so the model only ever sees the
    candidate set, never the corpus. The scorer is an Arrow-batched
    mapInPandas stage (_ce_score_batches, the inference seam — swap the
    body for a real model, keep the plumbing); candidates are BROADCAST
    into the documents scan so passage text joins map-side and only 10
    (doc_id, text, rrf) rows ever reach Python.

    100 TB: rerank cost is O(candidates x model), independent of corpus
    size; the text join is a broadcast-semi shape (no shuffle of the
    documents table); at larger candidate sets the same plan fans the
    pairs across executors in Arrow batches — exactly how GPU rerankers
    are fed.

    Oracle: full replication (_ce_rerank_oracle_sql) — candidates from
    the certified RRF oracle, the deterministic scorer as explicit
    same-order folds, tie-free 6dp quantization."""
    from pyspark.sql.window import Window

    cands = search_hybrid_rrf(spark, sf)  # 10 rows: (doc_id, rrf)
    d = table(spark, sf, "documents").select("doc_id", "text")
    paired = d.join(F.broadcast(cands), "doc_id")
    scored = paired.mapInPandas(
        _ce_score_batches(_QUERY_TERMS), "doc_id long, rrf double, ce_raw double"
    )
    ranked = scored.select(
        "doc_id",
        "rrf",
        (F.floor(F.col("ce_raw") * 1e6 + F.lit(0.5)) / 1e6).alias("ce_score"),
    )
    w = Window.orderBy(F.col("ce_score").desc(), F.col("rrf").desc(), "doc_id")
    return ranked.withColumn("rank_ce", F.row_number().over(w)).orderBy("rank_ce")
