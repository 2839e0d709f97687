"""Full driver replica: run EVERY registered op on a vanilla
SparkSession from a foreign cwd against the DuckDB oracle at sf0.01
(rows-only ops get an execute+schema check) — the strongest local
approximation of the grading driver's CORRECTNESS sweep.

Usage: python tools/driver_replica.py [sf_dir] [out_json] [--double]

``--double`` runs every op TWICE in the same session with the oracle
checked on both passes — the driver may re-run ops in one session, and
state-idempotency or conf-leak bugs only surface on the second pass
(r3 validated all 329 ops this way; keep doing it per round).
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
    args = [a for a in sys.argv[1:] if a != "--double"]
    double = "--double" in sys.argv[1:]
    sf_dir = os.path.abspath(args[0]) if len(args) > 0 else "/root/testdata/sf0.01"
    out = os.path.abspath(args[1]) if len(args) > 1 else "/tmp/driver_replica.json"
    os.chdir("/tmp")  # foreign cwd on purpose (args resolved FIRST — ADVICE r5 class)

    import duckdb
    from pyspark.sql import SparkSession

    from oracle_compare import compare_frames

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    from oracle_compare import register_views

    register_views(con, sf_dir)

    results: dict[str, dict] = {}
    fails: list[str] = []
    total = 0.0
    for sweep in range(2 if double else 1):
        tag = f"#{sweep + 1}" if double else ""
        for name, fn in q.items():
            key = f"{name}{tag}"  # r8: record each sweep; #2 no longer overwrites #1
            t0 = time.monotonic()
            try:
                pdf = fn(spark, sf_dir).toPandas()
                # The grading driver canonicalizes EVERY output (rows-only
                # too) with a pandas multi-column sort; list/dict/ndarray
                # cells make its factorize step throw `unhashable type`
                # (r2: the crashes on multimodal_columns /
                # ingest_properties_zip never produced even a row count).
                # Reproduce that here so the class of defect fails locally
                # instead of only in the driver.
                if len(pdf.columns):
                    pdf.sort_values(by=sorted(pdf.columns), kind="stable")
                if name in o:
                    odf = con.sql(o[name]).df()
                    probs = compare_frames(pdf, odf, name)
                    if probs:
                        status = "FAIL"
                    elif len(pdf) == 0 and len(odf) == 0:
                        # Both engines emitted ZERO rows: the hash matches
                        # trivially and certifies nothing — a broken
                        # predicate would look identical (VERDICT r4 item 8;
                        # q_dominant_suppliers certified vacuously in r4).
                        status = "VACUOUS"
                    else:
                        status = "pass"
                    detail = probs or None
                else:
                    status, detail = "rows_only", None
                results[key] = {
                    "status": status,
                    "rows": len(pdf),
                    "sec": round(time.monotonic() - t0, 2),
                    "detail": detail,
                }
            except Exception as ex:  # noqa: BLE001
                results[key] = {
                    "status": "ERROR",
                    "sec": round(time.monotonic() - t0, 2),
                    "detail": str(ex)[:300],
                }
            total += results[key]["sec"]
            if results[key]["status"] in ("FAIL", "ERROR", "VACUOUS"):
                fails.append(key)
            print(
                f"{results[key]['sec']:7.2f}s {results[key]['status']:>9} {key}",
                flush=True,
            )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    n = len(results)  # r8: one entry per (op, sweep) — no multiplier
    print(f"TOTAL {total:.0f}s over {n} op runs; FAILS: {fails}")


if __name__ == "__main__":
    main()
