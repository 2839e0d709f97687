"""Time every registered op at a given sf dir (Spark side only).

Usage: python tools/time_sweep.py [sf_dir] [out_json] [limit]
Approximates the driver's correctness-sweep cost per op (the DuckDB
oracle side is comparatively negligible at sf0.01). ``limit`` times only
the first N ops of the priority order — i.e. the driver's sweep window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpspark.session import build  # noqa: E402
import bpspark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_times.json"
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = build("time_sweep")
    bpspark.ensure_worker_imports(spark)
    times: dict[str, float] = {}
    items = list(bpspark.all_ops().items())
    if limit:
        items = items[:limit]
    for name, o in items:
        t0 = time.monotonic()
        try:
            df = o.fn(spark, sf_dir)
            n = df.count()
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, str(e)[:200]
        dt = time.monotonic() - t0
        times[name] = round(dt, 3)
        print(f"{dt:8.2f}s  {n:>8}  {name}" + (f"  ERR {err}" if err else ""), flush=True)
    with open(out, "w") as f:
        json.dump(times, f, indent=1, sort_keys=True)
    total = sum(times.values())
    print(f"TOTAL {total:.1f}s over {len(times)} ops")
    top = sorted(times.items(), key=lambda kv: -kv[1])[:25]
    for k, v in top:
        print(f"  {v:8.2f}s {k}")


if __name__ == "__main__":
    main()
