#!/usr/bin/env python
"""sim_adaptive_route saturation probe (VERDICT r3 item 5).

The r3 scaling probe measured 2.34× wall per 10× data on sim_adaptive_route
because k = √n was still growing at sf sizes — O(n·√n·d) map-side corpus
assignment. Round 4 caps this op's quantizer at _ADAPTIVE_MAX_K=512, so the
assignment saturates to O(n·512·d) — linear — at n = 512² ≈ 262k vectors.
The sf test dirs stop at ~80k vectors (pre-saturation), so this probe builds
a SYNTHETIC clustered corpus at sizes past the knee and times the identical
plan (bpspark.llm_ops._adaptive_route_frame) end to end:

  n ∈ {300k, 600k, 1.2M}  (all ≥ 262k → k pinned at 512)
  expected: wall grows ≈ 2× per 2× of data (linear regime)

Corpus shape: 64 well-separated clusters (basis-vector anchors + bounded
deterministic noise) — the clustered case IVF is designed for, and the one
where the margin router actually sends most queries down the IVF path.
Written to parquet first so every branch of the multi-read plan scans files
exactly like the registered op does.

Usage: python tools/adaptive_route_probe.py [--sizes 300000,600000,1200000]
Prints one JSON line per size + a growth summary. Recorded in docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_D = 64
# Natural clusters must be MANY MORE than the 512 quantizer cells: with
# fewer anchors than cells, Lloyd collapses several centroids onto each
# anchor and every query's top-2 centroids are near-duplicates — margin ≈ 0,
# all 25 queries route exact, and (worse) AQE prunes the empty-broadcast IVF
# branch so the probe would skip the very assignment cost it exists to time.
# With 8192 pseudo-random anchors per 512 cells, each cell holds ~16 anchors,
# top-1 vs top-2 cell similarity differs materially, and most queries route
# IVF (the realistic mix).
_CLUSTERS = 8192


def synth_corpus(spark, n: int, path: str) -> None:
    """n deterministic clustered vectors: anchor(c) = hash-random direction
    for cluster c = vec_id % 8192 (elements in [-1, 1)), plus per-element
    hash noise in [0, 0.1) — wide inter-cell margins, tight clusters."""
    j = F.sequence(F.lit(0), F.lit(_D - 1))
    c = F.pmod(F.col("vec_id"), F.lit(_CLUSTERS))
    emb = F.transform(
        j,
        lambda jj: (
            F.pmod(F.xxhash64(c, jj), F.lit(2000)).cast("double") / F.lit(1000.0)
            - F.lit(1.0)
            + F.pmod(F.xxhash64(F.col("vec_id"), jj, F.lit(7)), F.lit(1000)).cast("double")
            / F.lit(10000.0)
        ).cast("float"),
    )
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )


def _recall_at_5(e, res) -> float:
    """Mean per-query overlap of the routed result's top-5 neighbor set
    with the exact brute-force top-5 (ties broken identically: cosine
    desc, neighbor_id asc — the op's own ordering)."""
    from pyspark.sql.window import Window

    from bpspark.llm_ops import _dot

    queries = e.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_norm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    truth_rows = (
        e.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
        .collect()
    )
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_rows}
    got = {(r["query_id"], r["neighbor_id"]) for r in res}
    return len(truth & got) / len(truth)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="300000,600000,1200000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bpspark.session import build
    from bpspark.llm_ops import _ADAPTIVE_MAX_K, _adaptive_route_frame, _adaptive_route_k, _with_norm

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Multi-million-row corpora × a 512-struct literal quantizer per row:
    # the per-task array_sort buffers don't fit local-mode's 1g default heap.
    spark = build(
        app_name="bpspark-adaptive-probe",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    stage = tempfile.mkdtemp(prefix="bpspark_adaptive_probe_")
    walls: list[float] = []
    try:
        for n in sizes:
            k = _adaptive_route_k(n)
            assert k == _ADAPTIVE_MAX_K, f"size {n} below saturation (k={k})"
            path = f"{stage}/n{n}"
            synth_corpus(spark, n, path)
            e = _with_norm(spark.read.parquet(path))
            # warm pass not needed: each size pays identical training +
            # assignment structure; JVM is warmed by the first (smallest) size
            t0 = time.perf_counter()
            res = _adaptive_route_frame(spark, e).collect()  # ONE execution
            wall = round(time.perf_counter() - t0, 2)
            walls.append(wall)
            rows = len(res)
            routes: dict[str, int] = {}
            for r in res:
                routes[r["route"]] = routes.get(r["route"], 0) + 1
            # recall@5 vs exact brute force AT SATURATED k (the sf-dir
            # recall test runs at 800 vectors where k = 28 < cap, so it
            # cannot observe the cap's effect; this can)
            recall = round(_recall_at_5(e, res), 3)
            print(
                json.dumps(
                    {
                        "n": n,
                        "k": k,
                        "wall_s": wall,
                        "rows": rows,
                        "routes": routes,
                        "recall_at_5": recall,
                    }
                ),
                flush=True,
            )
        growth = [
            {
                "step": f"{sizes[i]}->{sizes[i+1]}",
                "data_x": round(sizes[i + 1] / sizes[i], 2),
                "wall_x": round(walls[i + 1] / walls[i], 2),
            }
            for i in range(len(sizes) - 1)
        ]
        print(json.dumps({"saturated_k": _ADAPTIVE_MAX_K, "growth": growth}))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
