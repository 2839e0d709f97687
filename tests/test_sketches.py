"""Accuracy properties for the mergeable-sketch aggregates (rows-only ops:
no DuckDB equivalent exists, so the gate here is estimate-vs-exact bounds)."""

from __future__ import annotations

import duckdb

from bpspark.registry import all_ops

SF = "/root/testdata/sf0.01"


def test_hll_estimates_within_tolerance(spark):
    res = all_ops()["agg_sketch_hll"].fn(spark, SF).collect()
    exact = dict(
        duckdb.sql(
            f"SELECT source, COUNT(DISTINCT doc_id) FROM '{SF}/documents.parquet' GROUP BY source"
        ).fetchall()
    )
    exact["__all__"] = duckdb.sql(
        f"SELECT COUNT(DISTINCT doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert {r["scope"] for r in res} == set(exact)
    for r in res:
        true = exact[r["scope"]]
        assert abs(r["est_distinct"] - true) <= max(2.0, 0.05 * true), (
            r["scope"], r["est_distinct"], true,
        )


def test_count_min_overestimates_within_eps(spark):
    res = all_ops()["agg_sketch_count_min"].fn(spark, SF).collect()
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM '{SF}/events.parquet' GROUP BY event_type"
        ).fetchall()
    )
    n = sum(exact.values())
    assert {r["event_type"] for r in res} == set(exact)
    for r in res:
        true = exact[r["event_type"]]
        # CMS never underestimates; eps=0.001 bounds the overshoot by eps*N w.h.p.
        assert true <= r["est_count"] <= true + max(20, int(0.002 * n)), (
            r["event_type"], r["est_count"], true,
        )


def test_sketch_mv_merge_tracks_full_recompute(spark):
    """The incrementally-merged sketch must track the full recompute and
    the exact count. NOT register equality: Spark's DataSketches union
    coerces dense sketches through HLL_8, so merged and full estimates
    drift ~0.5% once sketches leave sparse mode (measured r8 at sf0.1) —
    the MV contract is estimate quality, emitted as tripwire booleans."""
    from bpspark.registry import all_ops
    from tests.conftest import SF_SMALL

    rows = all_ops()["mv_sketch_refresh"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.merged_close_to_full, r
        assert r.est_within_5pct, r
        assert r.exact_distinct > 0, r


def test_hll_intersection_estimate_within_bounds(spark):
    """Inclusion-exclusion over HLL sketches: the overlap estimate must
    land within ~3x the sketch's relative error of the exact overlap."""
    import bpspark
    from tests.conftest import SF_SMALL

    row = (
        bpspark.all_ops()["agg_sketch_hll_intersection"]
        .fn(spark, SF_SMALL)
        .collect()[0]
    )
    exact = row["exact_intersection"]
    est = row["est_intersection"]
    assert exact > 0
    # default lgK=12 HLL: sigma ~1.6%; inclusion-exclusion compounds it,
    # and small overlaps amplify relative error — allow a generous 25%
    assert abs(est - exact) <= max(0.25 * exact, 10), (est, exact)


def test_aqp_sample_estimate_ci_covers_exact(spark):
    """The AQP estimator's defining claims: the deterministic ~10% sample
    reproduces across runs; the 95% CI covers the exact total; the point
    estimate lands within 5% relative error at these SFs; the interval
    is proper (lo < est < hi)."""
    import bpspark
    from tests.conftest import SF_SMALL

    OPS = bpspark.all_ops()
    a = OPS["agg_aqp_sample_estimate"].fn(spark, SF_SMALL).toPandas()
    b = OPS["agg_aqp_sample_estimate"].fn(spark, SF_SMALL).toPandas()
    assert a.equals(b)
    r = a.iloc[0]
    assert 0.05 * r.n_total <= r.n_sample <= 0.15 * r.n_total
    assert r.ci_lo < r.est_total < r.ci_hi
    assert r.ci_lo <= r.exact_total <= r.ci_hi, "95% CI must cover the exact total"
    assert abs(r.est_total - r.exact_total) / r.exact_total < 0.05


def test_aqp_stratified_per_group_ci_coverage(spark):
    """Stratified AQP: every stratum's CI must cover its exact revenue,
    per-group relative error bounded, each stratum actually sampled
    (~10%), deterministic."""
    import bpspark
    from tests.conftest import SF_SMALL

    OPS = bpspark.all_ops()
    a = OPS["agg_aqp_groupby_stratified"].fn(spark, SF_SMALL).toPandas()
    b = OPS["agg_aqp_groupby_stratified"].fn(spark, SF_SMALL).toPandas()
    assert a.equals(b)
    assert len(a) == 3  # A / N / R
    assert ((a.ci_lo <= a.exact_revenue) & (a.exact_revenue <= a.ci_hi)).all()
    assert ((a.n_sample >= 0.05 * a.n_total) & (a.n_sample <= 0.15 * a.n_total)).all()
    assert (abs(a.est_revenue - a.exact_revenue) / a.exact_revenue < 0.05).all()


def test_mg_partition_superset_guarantee():
    """Any term with count > n/_HH_SUMMARY in the stream must survive the
    bounded Misra-Gries summary, under adversarial orderings (heavy terms
    first, last, interleaved) and across batch splits."""
    import pandas as pd

    from bpspark.analytics import _HH_SUMMARY, _mg_partition

    heavy = ["h%d" % i for i in range(5)]
    light = ["t%d" % i for i in range(3000)]
    stream = []
    for h in heavy:
        stream += [h] * 200  # 1000 heavy tokens
    stream += light  # 3000 singletons -> n=4000, n/S = 50 < 200
    for order in ("asis", "reversed", "interleaved"):
        s = list(stream)
        if order == "reversed":
            s = s[::-1]
        elif order == "interleaved":
            s = [t for pair in zip(s[:2000], s[2000:]) for t in pair]
        for nbatches in (1, 7):
            sz = (len(s) + nbatches - 1) // nbatches
            batches = [pd.DataFrame({"tok": s[i * sz : (i + 1) * sz]}) for i in range(nbatches)]
            out = pd.concat(list(_mg_partition(iter(batches))))
            surv = set(out["term"])
            assert len(out) <= _HH_SUMMARY + 1
            for h in heavy:
                assert h in surv, (order, nbatches, h)


def test_heavy_hitters_equal_exact_threshold(spark):
    """The two-pass output must equal the exact frequency-threshold
    query computed independently in pandas."""
    import pandas as pd

    from tests.conftest import SF_SMALL

    pdf = all_ops()["agg_heavy_hitters_mg"].fn(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = docs["text"].str.lower().str.split(" ").explode()
    vc = toks.value_counts()
    want = vc[50 * vc > len(toks)]
    assert dict(zip(pdf["term"], pdf["cnt"])) == want.to_dict()
