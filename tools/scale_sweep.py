#!/usr/bin/env python
"""Cross-SF oracle robustness sweep (round 5; VERDICT-class gate).

The grading driver certifies correctness ONLY at sf0.01. This tool runs
every oracle-backed op against DuckDB at a bigger SF (default sf0.1) to
catch the two failure classes that stay invisible at the certified SF:

- SF-dependent predicate degeneracy: a threshold that emits rows at
  sf0.01 but zero at sf0.1 certifies an empty result there (found:
  q_important_parts — a fixed fraction-of-total threshold; TPC-H itself
  scales Q11's fraction by 1/SF);
- float-accumulation forks that only appear with 10x the accumulation
  steps (none found in r5's 303-op run — the exact-integer discipline
  held, the strongest direct evidence it survives scale-up).

It also smoke-prices the ORACLES themselves at scale (found: the
unrolled k-core CTE chain re-inlined exponentially in DuckDB — 1530 s
at sf0.1 — fixed with AS MATERIALIZED).

Usage: python tools/scale_sweep.py [sf_dir] [out_json]
Prints one line per op; VACUOUS/FAIL/ERROR are the actionable rows.
DuckDB temp spill goes to the cwd's .tmp/ — run from /tmp or clean up.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sweep.json"
    # resolve relative args BEFORE the chdir, or a relative out_json would
    # silently land in /tmp instead of the caller's cwd (ADVICE r5)
    sf_dir, out = os.path.abspath(sf_dir), os.path.abspath(out)
    os.chdir("/tmp")  # foreign cwd + keeps DuckDB spill out of the repo

    import duckdb
    from pyspark.sql import SparkSession

    from oracle_compare import compare_frames, register_views

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    # shared view list (r12 harness hunt: this tool still carried its own
    # inline copy of the table list — the r8 drift class)
    register_views(con, sf_dir)

    res: dict[str, dict] = {}
    bad: list[str] = []
    for name in q:
        if name not in o:
            continue
        t0 = time.monotonic()
        try:
            pdf = q[name](spark, sf_dir).toPandas()
            probs = compare_frames(pdf, con.sql(o[name]).df(), name)
            if probs:
                st = "FAIL"
            elif len(pdf) == 0:
                st = "VACUOUS"
            else:
                st = "pass"
            res[name] = {
                "status": st,
                "rows": len(pdf),
                "sec": round(time.monotonic() - t0, 1),
                "detail": probs or None,
            }
        except Exception as ex:  # noqa: BLE001
            res[name] = {
                "status": "ERROR",
                "sec": round(time.monotonic() - t0, 1),
                "detail": str(ex)[:300],
            }
        if res[name]["status"] != "pass":
            bad.append(name)
        print(f"{res[name]['sec']:7.1f}s {res[name]['status']:>8} {name}", flush=True)
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"DONE {len(res)} oracle-backed ops at {sf_dir}; non-pass: {bad}")


if __name__ == "__main__":
    main()
