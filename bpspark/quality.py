"""Corpus-statistics quality scoring — LM perplexity, repetition signals,
random projection.

Round-2 additions to the LLM-data-pipeline family (SURVEY §2.3 north star:
"text analysis / quality scoring" — the CCNet/Gopher-style filters a
training-data pipeline runs before dedup). Reference provenance: the
reference validates each record against a dimension before ingest
(``MetadataIngestionServiceImpl.java:112-116`` — genre membership); these
ops are the corpus-statistics generalisation of that gate: score every
document against a model *trained on the corpus itself*, then filter.

The module has since grown the Lee-et-al substring dedup, boilerplate
n-gram mining, and the dq_* audit ops (Benford digits, referential
integrity). All are pure DataFrame plans (no Python in the scalar path)
with DuckDB oracles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bpspark.io import table
from bpspark.llm_ops import _word_shingles
from bpspark.registry import op


# THE bigram-LM scoring CTE chain — shared by this op's oracle AND
# sample_perplexity_buckets' (bpspark/selection.py), which previously
# carried a drift-prone verbatim copy (r10 review). Ends in `scored`
# (doc_id, n_bigrams, avg_nll).
_PPL_SCORE_CTES = """big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM big GROUP BY bigram),
    c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, COUNT(*) AS c1
           FROM big GROUP BY w1),
    scored AS (
        SELECT b.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(SUM(-ln(CAST(x.c2 AS DOUBLE) / y.c1)), 6) / COUNT(*) AS avg_nll
        FROM big b
        JOIN c2 x USING (bigram)
        JOIN c1 y ON string_split(b.bigram, ' ')[1] = y.w1
        GROUP BY b.doc_id
    )"""


@op(
    "text_perplexity_ngram",
    sql=f"""
    WITH {_PPL_SCORE_CTES}
    SELECT doc_id, n_bigrams, avg_nll FROM scored ORDER BY doc_id
    """,
)
def text_perplexity_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood (CCNet-style
    perplexity quality signal): train a word-bigram MLE model on the corpus
    itself, score each doc by mean -ln p(w2|w1). Low = fluent/common
    phrasing, high = gibberish or boilerplate-unlike text — the standard
    "head/middle/tail" quality split for pretraining data.

    Plan shape: ONE bigram explode feeds both the model (two hash
    aggregates: bigram counts, bigram-start counts) and the scoring join.
    The count tables are vocabulary-sized, not corpus-sized — at 100 TB
    the bigram-count aggregate collapses map-side (partial agg) to
    |vocab²-observed| rows, and scoring is a shuffle join on the bigram
    key (AQE broadcasts it when the vocab fits, which a word-level vocab
    usually does). No Python anywhere; ln() stays in codegen. Scoring in-
    corpus means every bigram has count ≥1 — no smoothing term needed (an
    out-of-corpus scorer would add add-k smoothing to the same plan).
    Float stability vs the oracle: ROUND(SUM,6)/COUNT, same convention as
    embedding_centroid_per_label."""
    d = table(spark, sf, "documents")
    # the interpreted bigram explode feeds three consumers (c2, c1, scoring)
    # and re-evaluates per consumer — spread a split-starved scan so each
    # evaluation parallelizes (no-op at scale; see _spread_if_scan_starved)
    from bpspark.llm_ops import _spread_if_scan_starved

    d = _spread_if_scan_starved(d, d, "doc_id")
    big = d.select(
        "doc_id", F.explode(_word_shingles(F.col("text"), 2)).alias("bigram")
    )
    c2 = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        big.select(F.split("bigram", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    scored = (
        big.withColumn("w1", F.split("bigram", " ").getItem(0))
        .join(c2, "bigram")
        .join(c1, "w1")
        .withColumn("nll", -F.log(F.col("c2").cast("double") / F.col("c1")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.round(F.sum("nll"), 6) / F.count(F.lit(1))).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


@op(
    "text_repetition_signals",
    sql="""
    WITH g5 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 3),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                       ws[i+3] || ' ' || ws[i+4])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    s5 AS (
        SELECT doc_id, COUNT(*) AS n5,
               ROUND(1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*), 6)
                   AS dup5_frac
        FROM g5 GROUP BY doc_id
    ),
    b AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    bc AS (SELECT doc_id, bigram, COUNT(*) AS n FROM b GROUP BY doc_id, bigram),
    s2 AS (
        SELECT doc_id,
               ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_bigram_share
        FROM bc GROUP BY doc_id
    )
    SELECT s5.doc_id, s5.n5, s5.dup5_frac, s2.top_bigram_share
    FROM s5 JOIN s2 USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filters, word-level: per doc (a) duplicate
    5-gram fraction (1 - distinct/total) and (b) most-frequent-bigram share
    of all bigrams. High values mean templated/looping text — the
    repetition rules every pretraining corpus applies before dedup (they
    catch within-document repetition that near-dedup, which compares
    *across* documents, cannot).

    Plan shape: two explode→hash-aggregate pipelines keyed by doc_id
    (5-grams: count + count-distinct in one aggregate; bigrams: per-
    (doc,bigram) count then per-doc max/sum), joined on doc_id. Both
    aggregates partially combine map-side; the shuffle key is doc_id, so
    data volume through the shuffle is O(#docs · distinct-grams-per-doc),
    never corpus-global state. Ratios are single divisions of exact
    integers — deterministic vs the oracle without sum-order concerns."""
    d = table(spark, sf, "documents")
    g5 = d.select("doc_id", F.explode(_word_shingles(F.col("text"), 5)).alias("gram"))
    s5 = g5.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n5"),
        F.round(
            1.0 - F.count_distinct("gram").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup5_frac"),
    )
    bc = (
        d.select("doc_id", F.explode(_word_shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s2 = bc.groupBy("doc_id").agg(
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top_bigram_share")
    )
    return s5.join(s2, "doc_id").orderBy("doc_id")


# Deterministic ±1 "random" sign for the JL projection: bit 16 of one LCG
# step seeded by the flattened (input_dim, output_dim) index. Stand-in for a
# seeded Gaussian/Rademacher matrix — Rademacher signs satisfy the JL lemma
# (Achlioptas 2001) and are exactly reproducible in ANSI SQL, which a float
# Gaussian draw is not. (A linear-in-(i,j) formula like (a·i + b·j) % 2 with
# odd a, b is NOT usable here: it collapses to parity(i+j), a rank-1 matrix.)
_D_IN, _D_OUT = 64, 16


def _jl_sign(i: int, j: int) -> int:
    x = (1103515245 * (i * _D_OUT + j) + 12345) % 2**31
    return 1 if (x >> 16) & 1 == 0 else -1


@op(
    "embedding_random_projection",
    sql=f"""
    SELECT vec_id, j AS out_dim,
           ROUND(SUM(CAST(embedding[i + 1] AS DOUBLE) *
                     (CASE WHEN ((1103515245 * (i * {_D_OUT} + j) + 12345)
                                 % 2147483648 // 65536) % 2 = 0
                           THEN 1 ELSE -1 END)), 6) / 4.0 AS val
    FROM embeddings, range({_D_IN}) t(i), range({_D_OUT}) u(j)
    GROUP BY vec_id, j
    ORDER BY vec_id, out_dim
    """,
)
def embedding_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64→16 via a
    deterministic Rademacher (±1) projection matrix, scaled by 1/√16 —
    the cheap preprocessing step before LSH/IVF indexing when raw
    embedding dims are wide (distances preserved within (1±ε), Achlioptas
    2001). Long-format output (vec_id, out_dim, val) keeps the oracle
    free of array-typed cells.

    Plan shape: entirely map-side — explode the 16 output dims first
    (one Generate over a literal int array), then one 64-term codegen sum
    of element_at(embedding)·element_at(sign-row literal, out_dim)
    products. Computing all 16 sums *before* the explode would be a
    1024-term expression tree — janino fails to compile the Generate's
    consume method and the whole stage silently falls back to
    interpreted; explode-first keeps each generated method at 64 terms
    and inside whole-stage codegen. No shuffle anywhere: at 100 TB this
    is the ideal operator shape — embarrassingly parallel, scan-bound.
    The sign matrix is baked into the plan as literals (64 rows × 16
    signs); a learned/larger projection matrix would broadcast instead.
    Float stability: ROUND(SUM,6) then exact /4 (2⁻²), per the
    centroid-op convention; Spark folds the 64 terms in index order,
    matching the oracle's per-group accumulation to well below the
    rounding grain."""
    e = table(spark, sf, "embeddings")
    emb = F.col("embedding")
    j = F.col("out_dim")

    # term i: emb[i] · signrow_i[out_dim], sign rows as 16-wide literals
    # (one parsed expr per row — see llm_ops._lit_double_array)
    from bpspark.llm_ops import _lit_double_array

    terms = [
        F.element_at(emb, i + 1).cast("double")
        * F.element_at(
            _lit_double_array(_jl_sign(i, jj) for jj in range(_D_OUT)), j + 1
        )
        for i in range(_D_IN)
    ]
    val = F.round(reduce(lambda a, b: a + b, terms), 6) / F.lit(4.0)
    return (
        e.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(_D_OUT - 1))).alias("out_dim"),
            emb,
        )
        .select("vec_id", j.cast("long").alias("out_dim"), val.alias("val"))
        .orderBy("vec_id", "out_dim")
    )


_SUBSTR_W = 20
_SUBSTR_CONCAT = " || ' ' || ".join(f"ws[i+{k}]" for k in range(_SUBSTR_W))


@op(
    "dedup_substring_spans",
    sql=f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - {_SUBSTR_W - 2}),
                                     i -> {_SUBSTR_CONCAT})) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
    per AS (
        SELECT g.doc_id, COUNT(*) AS n_grams,
               -- CAST: DuckDB promotes integer SUM to HUGEINT, whose pandas
               -- conversion is float64 while Spark emits int64 — the driver's
               -- per-column hash distinguishes 3 from 3.0 (r3 hash FAIL).
               CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM g LEFT JOIN dup d USING (gram)
        GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, n_dup,
           ROUND(CAST(n_dup AS DOUBLE) / n_grams, 6) AS dup_frac
    FROM per
    WHERE n_dup > 0
    ORDER BY doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level duplication (the fixed-window form of Lee et al.'s
    'Deduplicating Training Data Makes Language Models Better' exact
    substring dedup): count, per document, the 20-word windows that occur
    verbatim anywhere else in the corpus — near-dedup keeps documents,
    THIS finds the copy-pasted passages inside kept documents (licenses,
    navigation chrome, quoted boilerplate) that document-level methods
    structurally miss. Docs with n_dup=0 are filtered out (the common
    case — keeps the output the audit record of affected docs).

    Plan shape: one 20-gram explode → corpus-wide gram count (partial
    agg map-side; shuffle carries distinct grams) → self semi-join of
    gram rows against the duplicated-gram set on the gram key → per-doc
    count. A full suffix-array (variable-length longest-match, as in the
    paper) is a different algorithm class; the fixed-W window is the
    standard scalable approximation — any duplicated substring of
    length ≥ W contains a duplicated W-window, so recall at ≥W length
    is exact; only the reported span extent is approximate. At 100 TB
    the gram table is the cost center — shuffle volume ∝ corpus tokens —
    so production runs hash the gram (8-byte key through the shuffle)
    exactly as dedup_near_minhash hashes shingles; strings are kept here
    so the DuckDB oracle is byte-identical."""
    # r12 restructure (measured 35 s -> 2.1 s at sf0.1): one gram pass,
    # both per-doc counts in one aggregate, no semi-join chain.
    # r13 de-skew (VERDICT r12 item 1): the per-gram corpus count is a
    # two-level HashAggregate (partial/final — map-side partials absorb a
    # hot gram; only distinct grams cross the shuffle) joined back to the
    # gram rows, REPLACING the r12 `count() over (partition by gram)`
    # window: a window has NO partial aggregation, so at 100 TB a true
    # boilerplate gram puts every occurrence in one task and sorts it.
    # The join back is skew-splittable (AQE splits join partitions, never
    # windows) and broadcast-capable when the >1-occurrence gram set is
    # small. Cost: the gram explode is evaluated under both consumers
    # (aggregate + probe) — two parallel interpreted passes against the
    # old form's one pass + full gram-row sort; measured a wash at sf0.1
    # (~2 s) and strictly safer at scale. Results proven identical at all
    # three SFs (exceptAll + oracle hash); count(marker) keeps n_dup
    # non-nullable, matching the old inner-join schema exactly.
    from bpspark.llm_ops import _spread_if_scan_starved

    d = table(spark, sf, "documents")
    d = _spread_if_scan_starved(d, d, "doc_id")
    g = d.select(
        "doc_id", F.explode(_word_shingles(F.col("text"), _SUBSTR_W)).alias("gram")
    )
    dup = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gcnt"))
        .filter(F.col("gcnt") > 1)
        .select("gram", F.lit(1).alias("dup_marker"))
    )
    gg = g.join(dup, "gram", "left").select("doc_id", "dup_marker")
    return (
        gg.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("dup_marker").alias("n_dup"),
        )
        .filter(F.col("n_dup") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.round(F.col("n_dup").cast("double") / F.col("n_grams"), 6).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


_BP_N = 3           # gram width — tuned to the synthetic corpus's ~20-word
                    # vocabulary: at n=5 no gram repeats across 3 docs of a
                    # source at sf<=0.1 (degenerate signal); real web corpora
                    # use longer grams/lines with the same plan
_BP_MIN_DOCS = 3    # distinct docs (per source) before a gram is boilerplate
_BP_CONCAT = " || ' ' || ".join(f"ws[i+{k}]" for k in range(_BP_N))


@op(
    "text_boilerplate_ngrams",
    sql=f"""
    WITH g AS (
        SELECT doc_id, source,
               unnest(list_distinct(
                   list_transform(range(1, len(ws) - {_BP_N - 2}),
                                  i -> {_BP_CONCAT}))) AS gram
        FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
              FROM documents)
    ),
    bp AS (
        SELECT source, gram FROM g
        GROUP BY source, gram HAVING COUNT(*) >= {_BP_MIN_DOCS}
    ),
    per AS (
        SELECT g.doc_id, g.source, COUNT(*) AS n_grams,
               -- CAST: DuckDB integer SUM promotes to HUGEINT -> pandas
               -- float64 vs Spark int64 (cookbook rule, r3 hash FAIL)
               CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bp
        FROM g LEFT JOIN bp b USING (source, gram)
        GROUP BY g.doc_id, g.source
    )
    SELECT doc_id, source, n_grams, n_bp,
           ROUND(CAST(n_bp AS DOUBLE) / n_grams, 6) AS bp_frac
    FROM per
    ORDER BY doc_id
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Per-DOMAIN boilerplate detection (the line/passage-dedup stage of
    CCNet and RefinedWeb, adapted to these newline-free docs): an n-gram
    that appears in >= _BP_MIN_DOCS DISTINCT documents of the same
    ``source`` is template chrome (headers, navigation, license tails) —
    repeated WITHIN one doc doesn't count (that's text_repetition_signals'
    job), and repetition across different sources doesn't either (that's
    corpus-level dedup_substring_spans). Emits the per-doc audit record:
    distinct-gram count, boilerplate-gram count, and the fraction a
    cleaning pass would strip.

    Plan shape: explode distinct per-doc grams once; the boilerplate set
    is a (source, gram) partial-count aggregate (map-side combine, the
    shuffle carries distinct grams — vocabulary-sized, not corpus-sized);
    the flag-back is a left join ON THE SAME (source, gram) key, so AQE
    reuses the aggregate's partitioning rather than re-shuffling the gram
    rows. At 100 TB the per-source boilerplate sets are small enough to
    broadcast per partition-of-sources; strings stay un-hashed here so the
    DuckDB oracle is byte-identical (same trade as dedup_substring_spans).

    Reference provenance: generalises the reference's per-record validity
    gate (MetadataIngestionServiceImpl.java:112-116) to a corpus-derived
    cleaning signal, per SURVEY §2.3's text-analysis charter."""
    return boilerplate_frame(table(spark, sf, "documents"))


def boilerplate_frame(d: DataFrame) -> DataFrame:
    """Core plan over any (doc_id, source, text) frame — split out so tests
    can plant template docs and assert the flagging rules directly.

    Contract (ADVICE r12): ``doc_id`` is assumed unique across the frame
    (in particular, never repeated under multiple sources). Since r12 the
    per-doc totals aggregate on (doc_id, source); a doc_id planted under
    two sources would get one output row PER source, where the pre-r12
    join-on-doc_id form attached the doc-wide total to each row. Both
    testdata and every planting test satisfy uniqueness."""
    # r12 restructure (same class as dedup_substring_spans' 35 s -> 2 s
    # fix): one gram pass, both per-doc counts in one aggregate.
    # r13 de-skew (VERDICT r12 item 1, same change as substring_spans):
    # the per-(source, gram) doc count is a two-level HashAggregate
    # (map-side partials absorb the hot template grams this op exists to
    # find; the shuffle carries distinct grams) joined back to the gram
    # rows — the r12 `count() over (partition by source, gram)` window had
    # no partial aggregation, so a corpus-wide boilerplate gram serialized
    # into one task at scale. Results proven identical at all three SFs
    # (exceptAll + oracle hash); count(marker) keeps n_bp non-nullable
    # like the old coalesce. NOTE (ADVICE r12): n_bp aggregates per
    # (doc_id, source) — a doc_id that appeared under multiple sources
    # would get per-source totals, unlike the pre-r12 doc-wide join;
    # equivalent on any corpus where doc_id is unique (true for the
    # testdata and every planting test).
    from bpspark.llm_ops import _spread_if_scan_starved

    d = _spread_if_scan_starved(d, d, "doc_id")
    g = d.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(_word_shingles(F.col("text"), _BP_N))
        ).alias("gram"),
    )
    bp = (
        g.groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
        .select("source", "gram", F.lit(1).alias("bp_marker"))
    )
    gg = g.join(bp, ["source", "gram"], "left").select(
        "doc_id", "source", "bp_marker"
    )
    return (
        gg.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("bp_marker").alias("n_bp"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.col("n_bp").cast("long").alias("n_bp"),
            F.round(F.col("n_bp").cast("double") / F.col("n_grams"), 6).alias(
                "bp_frac"
            ),
        )
        .orderBy("doc_id")
    )


def _benford_values_sql() -> str:
    """The 9 Benford expected frequencies as python-computed double
    literals — shared verbatim by the Spark plan and the oracle, so no
    engine ever evaluates log10 (libm results are not contractually
    identical across engines)."""
    import math

    # CAST is load-bearing: DuckDB parses a bare decimal literal as
    # DECIMAL, and DECIMAL-path arithmetic rounds differently from the
    # double path Spark runs — a last-ULP chi2 fork without it
    return ", ".join(
        f"('{d}', CAST({math.log10(1 + 1 / d)!r} AS DOUBLE))" for d in range(1, 10)
    )


@op(
    "dq_benford_digits",
    sql=f"""
    WITH src AS (
        SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    cnt AS (SELECT digit, COUNT(*) AS n_raw FROM src GROUP BY digit),
    tot AS (SELECT COUNT(*) AS n_total FROM src),
    grid AS (SELECT * FROM (VALUES {_benford_values_sql()}) AS t(digit, expected_freq))
    SELECT g.digit,
           COALESCE(c.n_raw, 0) AS n_obs,
           t.n_total,
           g.expected_freq,
           CAST(COALESCE(c.n_raw, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS obs_freq,
           CAST(COALESCE(c.n_raw, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
               - g.expected_freq AS deviation,
           (CAST(COALESCE(c.n_raw, 0) AS DOUBLE) - g.expected_freq * t.n_total)
             * (CAST(COALESCE(c.n_raw, 0) AS DOUBLE) - g.expected_freq * t.n_total)
             / (g.expected_freq * t.n_total) AS chi2_term
    FROM grid g LEFT JOIN cnt c ON g.digit = c.digit CROSS JOIN tot t
    ORDER BY g.digit
    """,
)
def dq_benford_digits(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    statistical forensics screen (Benford'38; Nigrini's fraud-audit
    methodology): naturally-occurring multi-decade amounts follow
    P(d) = log10(1 + 1/d), and a ledger whose digit histogram deviates
    hard is the first flag for fabricated or truncated data. One row
    per leading digit 1-9 with observed count, observed vs expected
    frequency, the deviation, and the per-digit chi-square term —
    emitted per digit rather than summed, so every statistic stays a
    ROW-LOCAL float expression (no order-dependent float aggregate;
    the caller sums 9 rows for the test statistic).

    Cross-engine float discipline: digits come from the STRING form of
    the floored integer amount (no log10/log on the data path); the
    expected frequencies are python-computed double literals shared
    verbatim by both plans (_benford_values_sql); obs_freq is ONE
    division of exact integers; deviation and the chi-square term are
    short fixed-shape per-row expressions (x*x instead of pow), so the
    driver hash matches exactly. Plan: one scan + one 9-group hash
    aggregate + a broadcast 9-row grid; nothing downstream exceeds 9
    rows — at 100 TB this is a single map-side-combining pass."""
    import math

    expected = [(str(d), math.log10(1 + 1 / d)) for d in range(1, 10)]
    src = (
        table(spark, sf, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
            ).alias("digit")
        )
    )
    cnt = src.groupBy("digit").agg(F.count(F.lit(1)).alias("n_raw"))
    tot = src.agg(F.count(F.lit(1)).alias("n_total"))
    grid = spark.createDataFrame(expected, "digit string, expected_freq double")
    joined = (
        grid.join(cnt, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n_obs"),
            "n_total",
            "expected_freq",
        )
    )
    obs_freq = F.col("n_obs").cast("double") / F.col("n_total").cast("double")
    diff = F.col("n_obs").cast("double") - F.col("expected_freq") * F.col("n_total")
    en = F.col("expected_freq") * F.col("n_total")
    return joined.select(
        "digit",
        "n_obs",
        "n_total",
        "expected_freq",
        obs_freq.alias("obs_freq"),
        (obs_freq - F.col("expected_freq")).alias("deviation"),
        (diff * diff / en).alias("chi2_term"),
    ).orderBy("digit")


_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@op(
    "dq_referential_audit",
    sql="""
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
        SELECT '{c}->{p}' AS fk_edge,
               COUNT(*) AS n_child_rows,
               COUNT(*) FILTER (WHERE {ck} IS NULL) AS n_null_keys,
               COUNT(*) FILTER (
                   WHERE {ck} IS NOT NULL
                     AND {ck} NOT IN (SELECT {pk} FROM {p} WHERE {pk} IS NOT NULL)
               ) AS n_orphans
        FROM {c}
        """
        for c, ck, p, pk in _FK_EDGES
    )
    + """
    ) ORDER BY fk_edge
    """,
)
def dq_referential_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-wide referential-integrity audit — ONE row per foreign-key
    edge of the whole star schema (7 edges), each carrying child row
    count, NULL-key count, and ORPHAN count (non-null keys with no
    parent). dq_expectations checks one FK rule among many per-row
    predicates; this op is the nightly relationship health report a
    warehouse runs across every edge at once — the first thing to
    consult when a join suddenly loses rows.

    Each edge is a LEFT-ANTI join of the child's DISTINCT keys against
    the parent key (distinct first, so the anti join probes |distinct
    child keys| rows, not |child|), then the orphan count re-joins the
    child's key histogram — cost per edge is one map-side distinct-agg
    + one broadcast-able anti join against the parent's key projection.
    At 100 TB the parent key sides (orders/customer/part/...) are the
    dimension scans a nightly stats job already pays; the child is
    scanned ONCE per edge (one key histogram feeds totals, NULL count,
    and the anti-join probe) and the oracle's NOT IN subquery filters
    parent NULLs so three-valued logic can never zero the orphan count. All-integer output — exact cross-engine."""
    out = None
    for child, ck, parent, pk in _FK_EDGES:
        row = _fk_edge_audit(
            table(spark, sf, child).select(F.col(ck).alias("k")),
            table(spark, sf, parent).select(F.col(pk).alias("k")),
            f"{child}->{parent}",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


def _fk_edge_audit(child_keys: DataFrame, parent_keys: DataFrame, label: str) -> DataFrame:
    """One FK edge's audit row from a child key column and a parent key
    column — factored so tests can inject orphans/NULLs directly. ONE
    pass over the child: a single groupBy(k) histogram (NULL keys form
    their own group) yields row totals, NULL count, and the non-null
    histogram the anti join probes — the child is never scanned twice."""
    p = parent_keys.filter(F.col("k").isNotNull()).distinct()
    key_hist = child_keys.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    totals = key_hist.agg(
        # coalesce like the other two columns (r10 review): an empty
        # child frame sums to NULL, while the oracle's COUNT(*) reads 0
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_child_rows"),
        F.coalesce(F.sum(F.when(F.col("k").isNull(), F.col("n"))), F.lit(0)).alias(
            "n_null_keys"
        ),
    )
    orphans = (
        key_hist.filter(F.col("k").isNotNull())
        .join(p, "k", "left_anti")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_orphans"))
    )
    return totals.crossJoin(orphans).select(
        F.lit(label).alias("fk_edge"), "n_child_rows", "n_null_keys", "n_orphans"
    )
