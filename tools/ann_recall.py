#!/usr/bin/env python
"""ANN recall/latency harness (VERDICT r1 item 8): measure the corpus×corpus
IVF kNN graph (bpspark/llm_ops.py::_ivf_knn_graph) against exact brute-force
ground truth at a given SF, sweeping nprobe. Prints one JSON line per nprobe:

  {"sf_dir": ..., "n": ..., "k_clusters": ..., "nprobe": N,
   "recall_at_5": R, "candidate_frac": C, "wall_s": S}

candidate_frac = scored candidate pairs / n² — the fraction of the all-pairs
work the bucketed plan actually does (the scale dial recall trades against).

Usage: python tools/ann_recall.py [--sf-dir DIR] [--nprobes 1,2,4,8]
Results are recorded in docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--nprobes", default="1,2,4,8")
    ap.add_argument(
        "--clustered",
        action="store_true",
        help="blend each vector toward a deterministic per-label anchor "
        "(mixture-of-clusters corpus — the realistic embedding-space shape "
        "IVF is designed for; the raw synthetic corpus is isotropic, the "
        "adversarial worst case for ANY bucketed ANN)",
    )
    args = ap.parse_args()

    from bpspark.session import build
    from bpspark.io import table
    from bpspark.llm_ops import (
        _dot,
        _ivf_centroid_literal,
        _ivf_knn_graph,
        _ivf_probe_assign,
        _with_norm,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build(app_name="bpspark-ann-recall", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    sf = args.sf_dir
    e = table(spark, sf, "embeddings")
    if args.clustered:
        from bpspark.llm_ops import _plane_weights

        ALPHA = 1.5  # within-cluster cosine ≈ α²d/(d+α²d·…) ≈ 0.69 at d=64
        anchors = {lab: _plane_weights(1000 + lab) for lab in range(10)}
        anchor_lit = F.element_at(
            F.array(*[F.array(*[F.lit(ALPHA * w) for w in anchors[lab]]) for lab in range(10)]),
            (F.col("label") % 10).cast("int") + 1,
        )
        e = e.withColumn(
            "embedding",
            F.zip_with(F.col("embedding"), anchor_lit, lambda x, a: (x.cast("double") + a).cast("float")),
        )
    e = _with_norm(e).cache()
    n = e.count()
    cent_lit, k_clusters = _ivf_centroid_literal(e)  # train ONCE; reused below

    # exact ground truth for ALL vectors (feasible at test SFs; at real
    # scale the harness samples queries — sim_ivf_recall_eval does)
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_norm") * F.col("norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    truth = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
        .cache()
    )
    truth_pairs = truth.count()

    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        t0 = time.perf_counter()
        approx = _ivf_knn_graph(e, nprobe=nprobe, cent_lit=cent_lit)
        hit_pairs = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        wall = time.perf_counter() - t0
        # candidate volume: sum over probed clusters of their home size
        assigned = _ivf_probe_assign(e, nprobe, cent_lit=cent_lit)
        sizes = (
            assigned.groupBy(F.col("home_cent").alias("cent_id"))
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        cand = (
            assigned.select("vec_id", F.explode("probe_cents").alias("cent_id"))
            .join(sizes, "cent_id")
            .agg(F.sum("sz").alias("cand"))
            .collect()[0]["cand"]
        )
        print(
            json.dumps(
                {
                    "sf_dir": sf,
                    "n": n,
                    "k_clusters": k_clusters,
                    "nprobe": nprobe,
                    "recall_at_5": round(hit_pairs / truth_pairs, 4),
                    "candidate_frac": round(cand / (n * n), 4),
                    "wall_s": round(wall, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
