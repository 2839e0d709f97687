#!/usr/bin/env python
"""Benchmark harness (driver contract): run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock over the headline set (the comparable headline
number tracked in BASELINE.md). Each query executes to completion with a
count() (no driver-side result materialization cost in the measurement).

Usage: python bench.py [--all] [--sf-dir DIR] [--repeat N]
  --all: bench every registered op, not just the headline set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family, weighted toward the
# shapes that dominate real pipelines (scan+agg, big join, window, dedup,
# similarity, text, ingestion parse).
HEADLINE = [
    "agg_group_sums",        # TPC-H Q1 shape: scan + pushed filter + hash agg
    "join_shuffle_inner",    # large-large shuffle join
    "join_broadcast_dim",    # broadcast star join
    "join_asof_latest_prior",# as-of emulation (join + window)
    "win_row_number_topk",   # window top-k per group
    "agg_count_distinct",    # two-stage distinct aggregate
    "set_union_distinct",    # set op + dedup
    "fn_string",             # scalar-function projection throughput
    "stream_tumbling_count", # event-time windowed aggregation (batch twin)
    "dedup_exact_hash",      # content-hash dedup
    "dedup_near_minhash",    # MinHash-LSH banding
    "sim_cosine_topk",       # brute-force cosine top-k
    "text_quality_filter",   # regex-heavy quality gates
    "ingest_properties_zip", # ZIP -> properties parse (pandas-UDF path)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)  # best-of-3: first run pays JVM JIT; run-to-run host noise is ±20-30%
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from bpspark.session import build
    import bpspark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build(app_name="bpspark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    ops = bpspark.all_ops()
    names = sorted(ops) if args.all else [n for n in HEADLINE if n in ops]

    # warm the JVM + file-listing caches once with the flagship query
    ops["agg_group_sums"].fn(spark, args.sf_dir).count()
    calib_early = _machine_calibration(spark)

    # The ``repeat`` samples per query are SPREAD across two interleaved
    # passes over the whole set (3 -> 2+1), per-query min: ambient-load
    # windows on a shared host last seconds-to-minutes, so consecutive
    # repeats of ONE query all land in the same window — taking the last
    # measurement a full sweep later decorrelates it (r3's committed
    # 8.55 s vs 6.67 s quiet-machine was exactly this; see BASELINE.md).
    # Total sample count stays at ``repeat`` so the best-of statistic is
    # comparable with every previously recorded round.
    best_times: dict[str, float] = {}

    def _pass(reps: int) -> None:
        for name in names:
            for _ in range(reps):
                t0 = time.perf_counter()
                ops[name].fn(spark, args.sf_dir).count()
                dt = time.perf_counter() - t0
                if name not in best_times or dt < best_times[name]:
                    best_times[name] = dt

    passes = 0
    for reps in (args.repeat - args.repeat // 2, args.repeat // 2):
        _pass(reps)
        passes += 1
    # Degraded-host retry (VERDICT r4 item 4): if the data-independent
    # calibration probe WORSENED >25% between the warm-up and now, part of
    # the sweep ran inside an ambient-load window — the minima are
    # inflated, not comparable. Take up to two more single-rep passes
    # (per-query minima keep improving only if the host actually quieted
    # down); ``passes`` is recorded in the JSON so the sample count is
    # auditable. r4's official artifact was captured at calib 0.254 vs
    # 0.160 the round before — exactly the case this bounds. Only a
    # WORSENING triggers the retry (ADVICE r5): a host that got quieter
    # mid-sweep means the minima were captured under load-or-better, and
    # retrying there would grow the sample count (downward bias vs the
    # historical 3-sample best-of) without fixing anything.
    for _ in range(2):
        calib_now = _machine_calibration(spark)
        if calib_now <= 1.25 * calib_early:
            break
        _pass(1)
        passes += 1
    timings = {name: round(best_times[name], 3) for name in names}

    # Floor probe (VERDICT r5 item 8): the three heaviest headline
    # queries get their own DEDICATED 8-rep best-of, so every BENCH
    # artifact carries noise-floor evidence next to value_per_calib
    # instead of the calibration caveat living only in BASELINE.md
    # prose. Exactly 8 fresh samples regardless of --repeat or
    # degraded-host retries (NOT seeded from best_times — a retried
    # round would otherwise record a 9-10-sample minimum under the same
    # key and skew cross-round floor comparisons); kept OUT of
    # ``queries`` so the headline best-of statistic stays 3-sample
    # comparable across rounds.
    floor_probe: dict[str, float] = {}
    if not args.all:
        for name in ("join_asof_latest_prior", "sim_cosine_topk", "dedup_near_minhash"):
            if name not in ops:
                continue
            best = float("inf")
            for _ in range(8):
                t0 = time.perf_counter()
                ops[name].fn(spark, args.sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            floor_probe[name] = round(best, 3)

    # ingestion throughput (BASELINE.md contract): ~10k properties records
    # through scan_binary_zip -> mapInPandas parse -> exploded entries
    ingest_rps, ingest_floor_rps = _ingest_throughput(spark)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    value = round(sum(timings.values()), 3)
    # calib_sec itself swings with ambient load (0.110-0.202 observed in
    # three back-to-back runs) — measure it at a SECOND point in time and
    # keep the min, pairing "host's unloaded speed" with the best-of query
    # minima. Even so value_per_calib is a secondary, noisier signal: the
    # per-query raw numbers are the primary artifact (BASELINE.md caveat).
    calib = min(calib_early, _machine_calibration(spark))
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "ingest_records_per_s": ingest_rps,
        # Ingest noise evidence (VERDICT r9 item 2): the 3-sample
        # ingest_records_per_s swung 22k->16k across artifacts with
        # byte-identical parse code — these two fields let a reader
        # separate host drift from a parse-path regression inside the
        # artifact itself, like the query floor probes do for the
        # headline set. ingest_floor_8rep_rps uses 8 fresh dedicated
        # samples (floor-probe protocol); ingest_floor_rps_x_calib
        # MULTIPLIES the rate by the min-calibration seconds (a rate
        # normalizes inversely to a duration — value_per_calib divides
        # because it is a duration), giving a ~host-independent number.
        "ingest_floor_8rep_rps": ingest_floor_rps,
        "ingest_floor_rps_x_calib": round(ingest_floor_rps * calib) if calib else None,
        "calib_sec": calib,
        "value_per_calib": round(value / calib, 1) if calib else None,
        "floor_probe_8rep": floor_probe,
        "passes": passes,
    }
    print(json.dumps(out))


def _machine_calibration(spark) -> float:
    """Fixed, data-independent CPU calibration job: sum over a 200M-row
    range with per-row arithmetic, best-of-2. Identical work every round,
    so cross-round headline comparisons can be normalized for host drift
    (observed ±20-30% between runs/VMs — see BASELINE.md, which records
    the first measured value; earlier rounds have no calib figure)."""
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _ingest_throughput(spark) -> tuple[int, int]:
    """Parse-rate of the ZIP→properties pipeline over a 1000-ZIP staged
    drop folder (~10k records). Returns (records/s best-of-3 — the
    BASELINE.md-comparable statistic, protocol unchanged since v1 —,
    records/s best-of-8 — the dedicated floor probe, VERDICT r9
    item 2)."""
    import io as _io
    import random
    import zipfile
    import tempfile

    from bpspark.sources import parse_zip_entries, scan_drop_folder

    stage = tempfile.mkdtemp(prefix="bpspark_ingest_bench_")
    rng = random.Random(7)
    for i in range(1000):
        isbn = f"9781{i:09d}"
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(f"{isbn}.txt", f"Title=Book {i}\nGenre=Fiction\nAuthors=A{i}\nNrOfChapters=8\nNrOfPages={100+i%500}\n")
            for c in range(1, 1 + rng.randint(5, 12)):
                zf.writestr(f"chapter-{c}.txt", f"ChapterNumber={c}\nChapterTitle=Ch {c}\nChapterAuthor=A{i}\n")
        with open(f"{stage}/{isbn}.zip", "wb") as fh:
            fh.write(buf.getvalue())

    parsed = parse_zip_entries(scan_drop_folder(spark, stage))
    n = parsed.count()  # warm (file listing, JIT, Arrow worker spin-up)
    best = None
    for _ in range(3):  # steady-state: best-of-3, same protocol the 21.6k
        # rec/s baseline was recorded under (protocol changes would read
        # as phantom engine gains)
        t0 = time.perf_counter()
        parsed.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # dedicated floor probe: exactly 8 FRESH samples (not seeded from the
    # 3 above, mirroring floor_probe_8rep's fixed-sample-count rule so
    # cross-round floor comparisons stay like-for-like)
    floor = None
    for _ in range(8):
        t0 = time.perf_counter()
        parsed.count()
        dt = time.perf_counter() - t0
        floor = dt if floor is None else min(floor, dt)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)  # r12 hunt: 1000 staged
    # zips per bench run accumulated in /tmp forever
    return int(n / best), int(n / floor)


if __name__ == "__main__":
    main()
