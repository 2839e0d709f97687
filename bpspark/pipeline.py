"""The composed ingestion pipeline — reference operators R1→R17 as one
declarative DataFrame graph (SURVEY §3.4 path 2).

Reference flow (MetadataIngestionServiceImpl.java:95-123):
  1. isNewIsbn gate — three existence checks (:99, :181-210)   → anti-joins
  2. upload raw ZIP (:100)                                     → bronze sink
  3. extractBookAndChapterMetadata (:104, :131-162)            → parse_zip_entries
  4. book-record presence check (:107-110)                     → anti-join → quarantine
  5. genre validation (:112-116, :170-173)                     → semi-join (broadcast dim)
  6. startBestPubWorkflowInstance (:119, :219-248)             → control-table rows

Ordering mirrors the reference's cheap-predicate-first stance (§4.1): the
ledger anti-joins run BEFORE parsing, so already-seen ZIPs are never
unzipped. At 100 TB: arrivals×ledger joins shuffle on the business key
(or broadcast when the ledger side is small); parse parallelism = #files;
everything downstream is hash-partitioned by isbn.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark import errors
from bpspark.config import IngestionConfig
from bpspark.fixtures import default_dir
from bpspark.registry import op
from bpspark.sources import parse_zip_entries, scan_drop_folder

# R12: the five projected book-record keys + ISBN (canonical key names per
# FIXTURES.md; the reference's literal constants live in the external model
# artifact — MetadataIngestionServiceImpl.java:231-236)
BOOK_KEYS = ("Title", "Genre", "Authors", "NrOfChapters", "NrOfPages")


@dataclass
class Ledgers:
    """The three idempotency ledgers (R8/R9/R10) + the genre dimension (R7)."""
    valid_genres: DataFrame
    ingested_zips: DataFrame
    workflows: DataFrame
    completed_books: DataFrame

    @staticmethod
    def load(spark: SparkSession, ledger_dir: str) -> "Ledgers":
        rd = spark.read
        return Ledgers(
            valid_genres=rd.parquet(f"{ledger_dir}/valid_genres.parquet"),
            ingested_zips=rd.parquet(f"{ledger_dir}/ingested_zips.parquet"),
            workflows=rd.parquet(f"{ledger_dir}/workflows.parquet"),
            completed_books=rd.parquet(f"{ledger_dir}/completed_books.parquet"),
        )


@dataclass
class IngestResult:
    arrivals: DataFrame        # every ZIP seen this batch
    new_arrivals: DataFrame    # after the three idempotency anti-joins
    entries: DataFrame         # parsed (isbn, entry, props) rows
    workflows_new: DataFrame   # R14 control rows for accepted books
    silver_chapters: DataFrame
    quarantine: DataFrame      # (path, error_code, error_msg)


def ingest_batch(spark: SparkSession, drop_dir: str, ledgers: Ledgers,
                 config: IngestionConfig | None = None) -> IngestResult:
    """One batch of the R1→R14 pipeline as a single DataFrame graph."""
    return ingest_from_arrivals(spark, scan_drop_folder(spark, drop_dir), ledgers, config)


def ingest_from_arrivals(spark: SparkSession, arrivals: DataFrame, ledgers: Ledgers,
                         config: IngestionConfig | None = None) -> IngestResult:
    """R2→R14 over an arrivals frame — shared by the batch entry point and
    the streaming foreachBatch path (each micro-batch is one arrivals set)."""
    config = config or IngestionConfig()

    # --- R8/R9/R10: idempotency gate, cheapest predicates first -----------
    new_arrivals = (
        arrivals
        .join(ledgers.ingested_zips.select("zip_name"), "zip_name", "left_anti")   # R8
        .join(ledgers.workflows.select("isbn"), "isbn", "left_anti")               # R9
        .join(ledgers.completed_books.select("isbn"), "isbn", "left_anti")         # R10
    )
    # within-batch single-flight (r8): two arrivals carrying the SAME
    # ISBN in one batch both pass the ledger anti-joins (the ledgers
    # only know PRIOR batches), which would emit duplicate control rows
    # in a single append — the reference never does, because its
    # per-file isNewIsbn check (MetadataIngestionServiceImpl.java:181)
    # sees the first file's in-flight workflow when the second is
    # processed. Batch equivalent: first path per ISBN wins; unkeyed
    # arrivals (isbn = '') are exempt — they are per-file quarantine
    # candidates, never a workflow key.
    #
    # r9 (ADVICE r8): winners are computed on an (isbn, path) PROJECTION
    # — min(path) per keyed isbn, identical to the former
    # row_number-over-(partitionBy isbn, orderBy path) == 1 winner — and
    # joined back by path as a broadcast left-semi, so the binary
    # `content` column never enters an exchange. The old window form
    # shuffled ZIP bytes by isbn even when the batch had no duplicates;
    # now only ~100-byte path strings shuffle (the winners agg), and the
    # semi join is map-side. A drop-folder micro-batch is file-arrival
    # scale (10^3-10^5 paths), well inside broadcast range.
    #
    # Precondition (both entry points satisfy it by construction): the
    # arrivals frame carries ONE row per path — scan_drop_folder and the
    # streaming file source both emit file listings, where path is the
    # row identity. A caller that unions overlapping listings would keep
    # duplicate copies of the per-isbn winner path here (the semi join
    # matches them all); deduplicating those would require shuffling
    # content rows, which is exactly what this form exists to avoid.
    # Unkeyed arrivals (isbn '' or NULL — NULL handled explicitly since
    # the filters would otherwise silently DROP those rows, r9 review)
    # are exempt: they are per-file quarantine candidates, never a
    # workflow key, so every one must survive to q_missing/R15.
    unkeyed = F.col("isbn").isNull() | (F.col("isbn") == "")
    winners = (
        new_arrivals.filter(~unkeyed)
        .select("isbn", "path")
        .groupBy("isbn")
        .agg(F.min("path").alias("path"))
        .select("path")
    )
    new_arrivals = new_arrivals.filter(unkeyed).unionByName(
        new_arrivals.filter(~unkeyed).join(
            F.broadcast(winners), "path", "left_semi"
        )
    )

    # --- R3/R4/R5: parse only the genuinely-new ZIPs -----------------------
    parsed = parse_zip_entries(new_arrivals)
    q_extract = parsed.filter(F.col("error_code").isNotNull()).select(
        "path", "error_code", "error_msg"
    )
    entries = parsed.filter(F.col("error_code").isNull())

    # --- R6: required book record ({isbn}.txt → entry == isbn) -------------
    books = entries.filter(F.col("entry") == F.col("isbn"))
    # r8: derive the MISSING_BOOK_METADATA set from new_arrivals, not
    # from parsed entries — a ZIP that parses to ZERO entries (empty
    # archive, directories only) previously vanished with neither a
    # control row nor a quarantine row, violating R15's every-rejected-
    # file contract. Now: every genuinely-new path that neither failed
    # extraction nor contains its own book record is quarantined.
    q_missing = (
        new_arrivals.select("path")
        .join(q_extract.select("path"), "path", "left_anti")
        .join(books.select("path").distinct(), "path", "left_anti")
        .select(
            "path",
            F.lit(errors.MISSING_BOOK_METADATA).alias("error_code"),
            F.lit("no book record entry named {isbn}.txt in ZIP").alias("error_msg"),
        )
    )

    # --- R7: genre must exist in the dimension (broadcast semi-join) -------
    books_g = books.withColumn("book_genre", F.element_at("props", F.lit("Genre")))
    genre_dim = F.broadcast(ledgers.valid_genres.select(F.col("genre_name").alias("book_genre")))
    valid_books = books_g.join(genre_dim, "book_genre", "left_semi")
    q_genre = (
        books_g.join(genre_dim, "book_genre", "left_anti")
        .select(
            "path",
            F.lit(errors.INVALID_GENRE).alias("error_code"),
            F.concat(F.lit("genre not in dimension: "), F.coalesce("book_genre", F.lit("<missing>"))).alias("error_msg"),
        )
    )

    # --- R12 typed projection + R13 enrichment -----------------------------
    projected = valid_books.select(
        "path",
        "isbn",
        F.element_at("props", F.lit("Title")).alias("book_title"),
        F.col("book_genre"),
        F.element_at("props", F.lit("Authors")).alias("book_authors"),
        F.element_at("props", F.lit("NrOfChapters")).cast("int").alias("nr_of_chapters"),
        F.element_at("props", F.lit("NrOfPages")).cast("int").alias("nr_of_pages"),
        F.current_timestamp().alias("publishing_date"),          # R13 :222,:237
        F.lit(False).alias("content_found"),                     # R13 :239
        F.lit(False).alias("content_error_found"),               # :240
        F.lit(False).alias("metadata_chapter_matching_ok"),      # :241
        F.lit(False).alias("chapter_folder_hierarchy_exists"),   # :242
        F.lit(config.interrupt_t1_timer).alias("interrupt_t1_timer"),            # :243
        F.lit(config.wait2_check_content_timer).alias("wait_2_check_content_timer"),  # :244
    )

    # --- R14: one control row per ISBN with the full metadata map ----------
    all_meta = entries.groupBy("isbn").agg(
        # deterministic entry order (collect_list order is not); structs with
        # map fields aren't orderable by sort_array → comparator on entry name
        F.array_sort(
            F.collect_list(F.struct("entry", "props")),
            lambda l, r: F.when(l.entry < r.entry, -1).when(l.entry > r.entry, 1).otherwise(0),
        ).alias("all_metadata")
    )
    workflows_new = (
        projected.join(all_meta, "isbn")
        .withColumn("workflow_id", F.concat(F.lit("wf-"), F.col("isbn")))
        .drop("path")
    )

    # --- chapters silver table ---------------------------------------------
    accepted = valid_books.select("isbn")
    silver_chapters = (
        entries.filter(F.col("entry").rlike(r"^chapter-[0-9]+$"))
        .join(accepted, "isbn", "left_semi")
        .select(
            "isbn",
            F.element_at("props", F.lit("ChapterNumber")).cast("int").alias("chapter_number"),
            F.element_at("props", F.lit("ChapterTitle")).alias("chapter_title"),
            F.element_at("props", F.lit("ChapterAuthor")).alias("chapter_author"),
        )
    )

    quarantine = q_extract.unionByName(q_missing).unionByName(q_genre)
    return IngestResult(
        arrivals=arrivals,
        new_arrivals=new_arrivals,
        entries=entries,
        workflows_new=workflows_new,
        silver_chapters=silver_chapters,
        quarantine=quarantine,
    )


def sink_control_table(workflows_new: DataFrame, control_dir: str) -> None:
    """R14/R17 sink: append control rows idempotently on plain parquet —
    anti-join on isbn against the existing table before the append, so a
    replayed batch adds zero rows (exactly-once without ACID, SURVEY §4.3)."""
    import glob
    import os

    spark = workflows_new.sparkSession
    if os.path.isdir(control_dir) and glob.glob(os.path.join(control_dir, "*.parquet")):
        existing = spark.read.parquet(control_dir).select("isbn")
        to_write = workflows_new.join(existing, "isbn", "left_anti")
    else:  # first write — nothing to replay-protect against
        to_write = workflows_new
    to_write.write.mode("append").parquet(control_dir)


def sink_quarantine_table(quarantine: DataFrame, quarantine_dir: str) -> None:
    """R15 sink, same idempotency contract as the control sink (ADVICE
    r10): foreachBatch is at-least-once, so a bare append would duplicate
    quarantine rows on a batch retry or a harness re-run over an existing
    stage dir. Anti-join on ``path`` — the arrival's unique identity —
    against the existing table, so a replayed batch adds zero rows.

    ``path`` is deliberately the arrival's PERMANENT identity, matching
    the arrivals ledger (ADVICE r11): a file fixed and re-dropped at the
    same path is the same arrival to the whole pipeline — the ledger
    would not re-ingest it either — so it must not produce a second
    quarantine record; the reference's drop-folder contract likewise
    treats a path as consumed once (MetadataIngestionServiceImpl.java:
    93-248 moves each file out of the folder exactly once). Duplicate
    paths WITHIN one batch cannot occur: the stream source lists each
    file once per run and the stage dir is keyed by path."""
    import glob
    import os

    spark = quarantine.sparkSession
    if os.path.isdir(quarantine_dir) and glob.glob(os.path.join(quarantine_dir, "*.parquet")):
        existing = spark.read.parquet(quarantine_dir).select("path")
        quarantine = quarantine.join(existing, "path", "left_anti")
    quarantine.write.mode("append").parquet(quarantine_dir)


# ---------------------------------------------------------------------------
# registered ops (rows-only: binary fixtures)
# ---------------------------------------------------------------------------

def _fixture_ledgers(spark: SparkSession) -> tuple[str, Ledgers]:
    d = default_dir()
    return d, Ledgers.load(spark, d)


# One fixture ingest per SparkSession: five pipeline_* ops read the same
# R1→R14 batch over the same fixture drop folder, and the idempotent
# rerun's anti-join would otherwise re-trigger the whole ZIP parse on
# every downstream action. The outputs are fixture-sized (tens of rows),
# so caching them is free; correctness is unchanged (each op still
# returns its own projection of the one batch).
_FIXTURE_INGEST: dict[int, tuple[str, Ledgers, IngestResult]] = {}


def _fixture_ingest(spark: SparkSession) -> tuple[str, Ledgers, IngestResult]:
    key = id(spark)
    if key not in _FIXTURE_INGEST:
        # keep only the live session's entry: cached DataFrames pin their
        # (possibly stopped) SparkSession's JVM state, so entries from
        # earlier sessions in the same interpreter must not accumulate
        _FIXTURE_INGEST.clear()
        d, ledgers = _fixture_ledgers(spark)
        res = ingest_batch(spark, f"{d}/drop", ledgers)
        res = IngestResult(
            arrivals=res.arrivals,
            new_arrivals=res.new_arrivals,
            entries=res.entries,
            workflows_new=res.workflows_new.cache(),
            silver_chapters=res.silver_chapters.cache(),
            quarantine=res.quarantine.cache(),
        )
        _FIXTURE_INGEST[key] = (d, ledgers, res)
    return _FIXTURE_INGEST[key]


@op("pipeline_ingest_batch", sql=None)
def pipeline_ingest_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Full R1→R14 batch over the fixture drop folder: accepted control rows
    (deterministic columns only — publishing_date is now())."""
    _, _, res = _fixture_ingest(spark)
    return res.workflows_new.select(
        "workflow_id", "isbn", "book_title", "book_genre", "book_authors",
        "nr_of_chapters", "nr_of_pages", "interrupt_t1_timer",
        "wait_2_check_content_timer",
    ).orderBy("isbn")


@op("pipeline_quarantine", sql=None)
def pipeline_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """R15 error channel: one row per rejected fixture ZIP."""
    _, _, res = _fixture_ingest(spark)
    return res.quarantine.select("path", "error_code").orderBy("path")


@op("pipeline_chapters", sql=None)
def pipeline_chapters(spark: SparkSession, sf: str) -> DataFrame:
    """Silver chapters exploded from accepted ZIPs (R3 explode + R12 typing)."""
    _, _, res = _fixture_ingest(spark)
    return res.silver_chapters.orderBy("isbn", "chapter_number")


@op("pipeline_idempotent_rerun", sql=None)
def pipeline_idempotent_rerun(spark: SparkSession, sf: str) -> DataFrame:
    """R8-R10 invariant: re-running ingestion with the first run's outputs in
    the ledgers yields zero new workflow rows. Returns one row with both
    counts so the check is self-evident. The rerun is structurally cheap by
    design: the R9 workflow anti-join fires BEFORE the parse, so already-
    ingested ZIPs are never re-unzipped (the reference's cheap-predicate-
    first stance, MetadataIngestionServiceImpl.java:99)."""
    d, ledgers, first = _fixture_ingest(spark)
    first_isbns = first.workflows_new.select("isbn")
    ledgers2 = Ledgers(
        valid_genres=ledgers.valid_genres,
        ingested_zips=ledgers.ingested_zips,
        workflows=ledgers.workflows.select("isbn").unionByName(first_isbns),
        completed_books=ledgers.completed_books,
    )
    rerun = ingest_batch(spark, f"{d}/drop", ledgers2)
    n_first = first.workflows_new.count()
    n_rerun = rerun.workflows_new.count()
    return spark.createDataFrame(
        [(n_first, n_rerun, n_rerun == 0)],
        "first_run_rows bigint, rerun_rows bigint, idempotent boolean",
    )


@op("sink_control_table", sql=None)
def sink_control_table_op(spark: SparkSession, sf: str) -> DataFrame:
    """R14/R17: idempotent control-table sink — write twice, read once;
    the second append contributes nothing."""
    import tempfile

    _, _, res = _fixture_ingest(spark)
    control = tempfile.mkdtemp(prefix="bpspark_control_") + "/workflows"
    sink_control_table(res.workflows_new, control)
    sink_control_table(res.workflows_new, control)  # replay must be a no-op
    return spark.read.parquet(control).select("workflow_id", "isbn").orderBy("isbn")


@op("pipeline_observe_metrics", sql=None)  # driver-side metric harvest
def pipeline_observe_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-extra-pass data-quality metrics via DataFrame.observe(): the
    silver projection runs ONCE and the observation accumulators (row
    count, null keys, revenue sum) ride along inside the same
    job — at 100 TB this replaces a whole second QC scan; metrics arrive
    on the driver through the observation listener channel, not a
    collect. Returned as a 1-row frame (rows-only: the observation API
    is engine-specific by nature; values are cross-checked against
    direct aggregation in tests/test_ingestion.py)."""
    from pyspark.sql import Observation

    from bpspark.io import table

    o = table(spark, sf, "orders")
    obs = Observation("qc")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    # one real pipeline action drives both the write-side work and the metrics
    observed.select("o_orderkey", "o_custkey", "o_totalprice").write.format("noop").mode(
        "overwrite"
    ).save()
    m = obs.get
    # SUM observations come back None on an empty input frame — report
    # zeros instead of a driver TypeError (r8; COUNT is never None)
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["null_keys"] or 0), float(m["revenue"] or 0.0))],
        "n_rows bigint, null_keys bigint, revenue double",
    )


@op(
    "pipeline_governed_batch",
    sql="""
    WITH dq AS (
        SELECT COUNT(*) FILTER (WHERE o_totalprice <= 0)
             + COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
             + COUNT(*) FILTER (WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-'))
               AS viol
        FROM orders
    ),
    olds AS (
        SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderkey % 10 <> 0
    ),
    news AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 13 <> 0
    ),
    cdc AS (
        SELECT COUNT(*) FILTER (WHERE olds.o_orderkey IS NULL) AS ins,
               COUNT(*) FILTER (WHERE news.o_orderkey IS NULL) AS del,
               COUNT(*) FILTER (WHERE olds.o_orderkey IS NOT NULL
                                  AND news.o_orderkey IS NOT NULL
                                  AND olds.price <> news.price) AS upd
        FROM olds FULL OUTER JOIN news ON olds.o_orderkey = news.o_orderkey
    ),
    mv AS (
        SELECT COUNT(*) AS groups FROM (
            SELECT DISTINCT CAST(o_orderdate AS VARCHAR), o_orderpriority FROM orders
        )
    )
    SELECT 'dq_violations' AS metric, CAST(viol AS BIGINT) AS value FROM dq
    UNION ALL SELECT 'cdc_inserts', ins FROM cdc
    UNION ALL SELECT 'cdc_deletes', del FROM cdc
    UNION ALL SELECT 'cdc_updates', upd FROM cdc
    UNION ALL SELECT 'mv_groups', groups FROM mv
    ORDER BY metric
    """,
)
def pipeline_governed_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Governed-batch flagship: the round-2 governance ops as ONE run —
    (1) the DQ expectation gate (conditional counts, one orders scan;
    a real pipeline quarantines when this is non-zero — reference R6/R9
    flow), (2) the CDC change-set extraction (full-outer key diff,
    output ∝ churn), (3) the incremental-MV refresh group count (work ∝
    delta + groups). Emits the run report every production batch job
    logs: one (metric, value) row per stage, all deterministic and
    oracle-checked — composition changes nothing about each stage's
    scale posture (their standalone ops assert the plan shapes)."""
    from bpspark.io import table
    from bpspark.layout import mv_incremental_refresh
    from bpspark.relational_ext import cdc_snapshot_diff

    o = table(spark, sf, "orders")
    dq = o.agg(
        (
            F.count_if(F.col("o_totalprice") <= 0)
            + F.count_if(~F.col("o_orderstatus").isin("F", "O", "P"))
            + F.count_if(~F.col("o_orderpriority").rlike("^[1-5]-"))
        ).alias("v")
    ).select(F.lit("dq_violations").alias("metric"), F.col("v").cast("long").alias("value"))
    cdc = cdc_snapshot_diff(spark, sf)
    cdc_counts = cdc.agg(
        F.count_if(F.col("change_type") == "I").alias("ins"),
        F.count_if(F.col("change_type") == "D").alias("del"),
        F.count_if(F.col("change_type") == "U").alias("upd"),
    )
    cdc_rows = cdc_counts.select(
        F.explode(
            F.array(
                F.struct(F.lit("cdc_inserts").alias("metric"), F.col("ins").alias("value")),
                F.struct(F.lit("cdc_deletes").alias("metric"), F.col("del").alias("value")),
                F.struct(F.lit("cdc_updates").alias("metric"), F.col("upd").alias("value")),
            )
        ).alias("s")
    ).select("s.metric", "s.value")
    mv = mv_incremental_refresh(spark, sf).agg(F.count(F.lit(1)).alias("g")).select(
        F.lit("mv_groups").alias("metric"), F.col("g").cast("long").alias("value")
    )
    return dq.unionByName(cdc_rows).unionByName(mv).orderBy("metric")
