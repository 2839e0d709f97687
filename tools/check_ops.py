#!/usr/bin/env python
"""Ad-hoc oracle parity check for a named subset of ops at one or more SFs.

Usage: python tools/check_ops.py op1 op2 ... [--sf 0.001,0.01,0.1]

Runs each op's Spark plan and DuckDB oracle side by side (vanilla session,
foreign cwd, same comparator as tools/driver_replica.py) and prints
PASS/FAIL per (op, sf). Exit 1 on any failure. This is the fast loop for
rows-only -> oracle-backed upgrades; the full replica still gates the round.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))



def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ops", nargs="+", help="op names from the registry")
    ap.add_argument("--sf", default="0.01", help="comma-separated SFs, e.g. 0.001,0.01,0.1")
    args = ap.parse_args()
    names, sfs = args.ops, args.sf.split(",")
    os.chdir("/tmp")

    import duckdb
    from pyspark.sql import SparkSession

    from oracle_compare import compare_frames, register_views

    from bpspark.registry import all_ops

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bpspark

    bpspark.ensure_worker_imports(spark)
    ops = all_ops()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        register_views(con, sf_dir)
        for name in names:
            op = ops.get(name)
            if op is None:
                print(f"{name}: UNKNOWN op (not in registry)")
                bad += 1
                continue
            if op.sql is None:
                print(f"{name} sf{sf}: NO-ORACLE (rows-only)")
                continue
            import time

            t0 = time.time()
            try:
                spdf = op.fn(spark, sf_dir).toPandas()
                # same canonicalization crash probe as driver_replica (r8):
                # list/dict cells crash the grading driver's sort+factorize
                if len(spdf.columns):
                    spdf.sort_values(by=sorted(spdf.columns), kind="stable")
                t1 = time.time()
                odf = con.sql(op.sql).df()
                t2 = time.time()
                err = compare_frames(spdf, odf, name)
                if not err and len(spdf) == 0 and len(odf) == 0:
                    # zero rows on both engines certifies nothing — the
                    # VERDICT r4 vacuous class, already flagged by the
                    # replica and scale sweep but not by this fast loop
                    err = ["VACUOUS: both engines returned 0 rows"]
                status = "PASS" if not err else f"FAIL: {err}"
                if err:
                    bad += 1
                print(
                    f"{name} sf{sf}: {status} "
                    f"(spark {len(spdf)}r/{t1-t0:.1f}s, oracle {len(odf)}r/{t2-t1:.1f}s)"
                )
            except Exception as ex:  # noqa: BLE001 — report, keep checking the rest
                bad += 1
                print(f"{name} sf{sf}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
        con.close()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
