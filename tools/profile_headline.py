"""Per-query optimization profiler (round 12, guide §1).

For each headline query (or a named subset): capture .explain("formatted")
to plans/<tag>/<name>_<suffix>.txt, then time the plan with the noop sink
(guide §1.4 — computes every column, no driver materialization) best-of-N,
labelled via setJobDescription. Prints one line per query plus plan-shape
counters (Exchange count, join nodes, Python eval nodes) so before/after
diffs are one `diff` away.

Usage: python tools/profile_headline.py [--suffix before|after] [--reps N]
                                        [--sf-dir DIR] [--ops a,b,c]
                                        [--plans-dir plans/r12]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpspark.session import build  # noqa: E402
import bpspark  # noqa: E402

HEADLINE = [
    "agg_group_sums", "join_shuffle_inner", "join_broadcast_dim",
    "join_asof_latest_prior", "win_row_number_topk", "agg_count_distinct",
    "set_union_distinct", "fn_string", "stream_tumbling_count",
    "dedup_exact_hash", "dedup_near_minhash", "sim_cosine_topk",
    "text_quality_filter", "ingest_properties_zip",
]

PLAN_NODE_RE = re.compile(
    r"\b(Exchange|BroadcastExchange|SortMergeJoin|BroadcastHashJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct|"
    r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
    r"FlatMapGroupsInPandas|Sort|Window|WindowGroupLimit|HashAggregate|"
    r"SortAggregate|ObjectHashAggregate)\b"
)


def plan_shape(plan_text: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for m in PLAN_NODE_RE.finditer(plan_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--ops", default="")
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1 (ADVICE r12: reps=0 leaves best at "
                 "inf, which serializes as non-standard JSON Infinity)")

    names = [n for n in args.ops.split(",") if n] or HEADLINE
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build(app_name="bpspark-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    bpspark.ensure_worker_imports(spark)
    ops = bpspark.all_ops()
    os.makedirs(args.plans_dir, exist_ok=True)

    # warm: JIT + file listing
    ops["agg_group_sums"].fn(spark, args.sf_dir).count()

    results: dict[str, dict] = {}
    for name in names:
        df = ops[name].fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if not args.no_plans:
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        best = float("inf")
        for i in range(args.reps):
            df = ops[name].fn(spark, args.sf_dir)  # fresh plan each rep (no reuse)
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        shape = plan_shape(plan)
        results[name] = {"noop_best_s": round(best, 3), "shape": shape}
        print(f"{best:7.3f}s  {name:26s} {json.dumps(shape)}", flush=True)

    total = sum(r["noop_best_s"] for r in results.values())
    print(f"TOTAL {total:.3f}s  ({args.suffix}, reps={args.reps}, sf={args.sf_dir})")
    out = os.path.join(args.plans_dir, f"profile_{args.suffix}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
