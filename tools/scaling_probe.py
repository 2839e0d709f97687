#!/usr/bin/env python
"""Scaling probe: time representative ops across sf0.001 / sf0.01 / sf0.1
(100× data range) and report the wall-clock growth factor per 10× of data.
A factor near 1 means fixed overhead dominates (healthy at these sizes); a
factor near 10 means linear; >10 means super-linear — the red flag the
plan-shape tests exist to prevent.

Usage: python tools/scaling_probe.py [op ...]
Prints one JSON line per op. Recorded in docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OPS = [
    "agg_group_sums",        # scan + hash agg: should track bytes scanned
    "join_shuffle_inner",    # shuffle join: shuffle ∝ rows
    "win_row_number_topk",   # window with WindowGroupLimit
    "dedup_near_minhash",    # LSH banding: candidate volume, not n²
    "sim_cosine_topk",       # broadcast-query scoring: corpus-linear
    "join_asof_latest_prior",# tagged-union sort: n log n per entity
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ops_wanted = sys.argv[1:] or DEFAULT_OPS
    from bpspark.session import build
    import bpspark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build(app_name="bpspark-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    bpspark.ensure_worker_imports(spark)
    ops = bpspark.all_ops()

    # warm JVM once
    ops["agg_group_sums"].fn(spark, SFS[0]).count()

    for name in ops_wanted:
        times = []
        for sf in SFS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                ops[name].fn(spark, sf).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append(round(best, 3))
        g1 = round(times[1] / times[0], 2) if times[0] else None
        g2 = round(times[2] / times[1], 2) if times[1] else None
        print(
            json.dumps(
                {
                    "op": name,
                    "wall_s": dict(zip(["sf0.001", "sf0.01", "sf0.1"], times)),
                    "growth_10x": [g1, g2],
                }
            )
        )


if __name__ == "__main__":
    main()
