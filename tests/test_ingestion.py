"""Golden-fixture ingestion tests (SURVEY §5.2.2): the R1→R14 pipeline over
the FIXTURES.md drop folder — acceptance counts, the four error/skip paths,
typed projection, and the idempotent-rerun invariant."""

from __future__ import annotations

import pytest

from bpspark import errors, fixtures
from bpspark.pipeline import Ledgers, ingest_batch


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return fixtures.generate(str(tmp_path_factory.mktemp("fix")))


@pytest.fixture(scope="module")
def result(spark, fixture_dir):
    ledgers = Ledgers.load(spark, fixture_dir)
    return ingest_batch(spark, f"{fixture_dir}/drop", ledgers)


def test_arrival_and_gate_counts(result):
    assert result.arrivals.count() == 46  # 40 clean + 3 ledger-dups + 3 error
    # R8/R9/R10 remove the three ledger-known arrivals before parsing
    assert result.new_arrivals.count() == 43
    gated_isbns = {r.isbn for r in result.new_arrivals.select("isbn").collect()}
    assert fixtures.DUP_ZIP_NAME_ISBN not in gated_isbns
    assert fixtures.DUP_WORKFLOW_ISBN not in gated_isbns
    assert fixtures.DUP_COMPLETED_ISBN not in gated_isbns


def test_accepted_books(result):
    rows = result.workflows_new.collect()
    assert len(rows) == 40  # 43 new - missing-book - bad-genre - corrupt
    byisbn = {r.isbn: r for r in rows}
    assert fixtures.MISSING_BOOK_ISBN not in byisbn
    assert fixtures.BAD_GENRE_ISBN not in byisbn
    assert fixtures.CORRUPT_ISBN not in byisbn
    # R12 typed projection + R13 enrichment on a sample row
    r = byisbn["9780000000000"]
    assert r.book_title == "Book 00"
    assert r.book_genre in fixtures.GENRES
    assert isinstance(r.nr_of_chapters, int) and 1 <= r.nr_of_chapters <= 8
    assert isinstance(r.nr_of_pages, int)
    assert r.content_found is False and r.content_error_found is False
    assert r.interrupt_t1_timer == "PT5M"
    assert r.wait_2_check_content_timer == "PT1M"
    assert r.workflow_id == "wf-9780000000000"
    # R14: full metadata map rides along (book + chapters entries)
    assert len(r.all_metadata) == r.nr_of_chapters + 1
    # continuation + latin-1 + \uXXXX parsing survived the full pipeline
    props = dict(next(m.props for m in r.all_metadata if m.entry == r.isbn))
    assert props["Authors"].endswith("(et al.)")
    assert props["Publisher"] == "BestPub éditions"
    assert props["Imprint"] == "Caf\xe9 Press"


def test_quarantine_paths(result):
    q = {r.path.rsplit("/", 1)[-1]: r.error_code for r in result.quarantine.collect()}
    assert q == {
        f"{fixtures.MISSING_BOOK_ISBN}.zip": errors.MISSING_BOOK_METADATA,
        f"{fixtures.BAD_GENRE_ISBN}.zip": errors.INVALID_GENRE,
        f"{fixtures.CORRUPT_ISBN}.zip": errors.EXTRACT_ZIP,
    }


def test_chapters_silver(result):
    ch = result.silver_chapters.collect()
    assert all(c.chapter_number >= 1 and c.chapter_title for c in ch)
    # chapters only from accepted books (the bad-genre book's chapters excluded)
    isbns = {c.isbn for c in ch}
    assert fixtures.BAD_GENRE_ISBN not in isbns
    # every accepted book contributes its NrOfChapters rows
    books = {r.isbn: r.nr_of_chapters for r in result.workflows_new.collect()}
    per_isbn: dict[str, int] = {}
    for c in ch:
        per_isbn[c.isbn] = per_isbn.get(c.isbn, 0) + 1
    assert per_isbn == books


def test_idempotent_rerun(spark, fixture_dir, result):
    """Re-run with the first run's ISBNs in the workflows ledger → 0 new rows."""
    ledgers = Ledgers.load(spark, fixture_dir)
    ledgers2 = Ledgers(
        valid_genres=ledgers.valid_genres,
        ingested_zips=ledgers.ingested_zips,
        workflows=ledgers.workflows.select("isbn").unionByName(
            result.workflows_new.select("isbn")
        ),
        completed_books=ledgers.completed_books,
    )
    rerun = ingest_batch(spark, f"{fixture_dir}/drop", ledgers2)
    assert rerun.workflows_new.count() == 0
    # quarantine re-reports the still-unresolved error files (no ledger entry)
    assert rerun.quarantine.count() == 3


def test_observe_metrics_match_direct_aggregation(spark):
    """observe() accumulators must equal a direct aggregation pass."""
    from bpspark.registry import all_ops
    from tests.conftest import SF_SMALL

    import duckdb

    row = all_ops()["pipeline_observe_metrics"].fn(spark, SF_SMALL).collect()[0]
    exp = duckdb.sql(
        f"SELECT COUNT(*) n, ROUND(SUM(o_totalprice),2) r FROM '{SF_SMALL}/orders.parquet'"
    ).fetchone()
    assert row["n_rows"] == exp[0]
    assert row["null_keys"] == 0
    assert abs(row["revenue"] - float(exp[1])) < 1e-6
