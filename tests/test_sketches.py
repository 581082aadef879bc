"""Accuracy, merge-consistency, and determinism pins for the
DataSketches rollup queries (rows-only at the driver, so these tests
ARE their correctness gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from makerdao_dw_spark.queries import sketches
from makerdao_dw_spark.session import load_table

from .conftest import SF_DIR

# These tests pin the RAW sketch estimates (the registered driver
# surface exposes exact counts + in-tolerance booleans instead, which
# the DuckDB oracle checks — see sketches.py).
_RAW = {
    "sketch_hll_daily_active": sketches.sketch_hll_daily_active_raw,
    "sketch_theta_userday_overlap": sketches.sketch_theta_userday_overlap_raw,
    "sketch_kll_value_quantiles": sketches.sketch_kll_value_quantiles_raw,
}


def run(spark, name):
    return _RAW[name](spark, SF_DIR)


def test_hll_rollup_accuracy_and_merge_exactness(spark):
    rows = {r.scope: r.est_users for r in run(spark, "sketch_hll_daily_active").collect()}
    e = load_table(spark, SF_DIR, "events")
    exact_daily = {
        str(r.d): r.n
        for r in e.groupBy(F.to_date("ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact_daily) | {"TOTAL"}
    for d, exact in exact_daily.items():
        assert abs(rows[d] - exact) <= max(1, 0.02 * exact), (d, rows[d], exact)
    exact_total = e.select("user_id").distinct().count()
    assert abs(rows["TOTAL"] - exact_total) <= max(1, 0.02 * exact_total)
    # union-of-parts == sketch-of-whole: HLL merge is register-wise max
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    assert rows["TOTAL"] == direct


def test_theta_set_algebra_vs_exact(spark):
    row = run(spark, "sketch_theta_userday_overlap").collect()[0]
    e = load_table(spark, SF_DIR, "events")
    keyed = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type",
        F.concat_ws("_", F.col("user_id"), F.to_date("ts")).alias("user_day"),
    )
    sets = {
        t: {r.user_day for r in keyed.filter(F.col("event_type") == t)
            .select("user_day").distinct().collect()}
        for t in ("click", "purchase")
    }
    a, b = sets["click"], sets["purchase"]
    exact = {
        "est_click": len(a),
        "est_purchase": len(b),
        "est_union": len(a | b),
        "est_intersection": len(a & b),
        "est_click_only": len(a - b),
    }
    # partial overlap required, else the set algebra proves nothing
    assert 0 < exact["est_intersection"] < exact["est_union"]
    for k, v in exact.items():
        assert abs(getattr(row, k) - v) <= max(2, 0.05 * v), (k, getattr(row, k), v)


def test_kll_quantiles_within_rank_error(spark):
    rows = {r.segment: r for r in run(spark, "sketch_kll_value_quantiles").collect()}
    e = load_table(spark, SF_DIR, "events")
    all_vals = sorted(r.value for r in e.select("value").collect())
    n = len(all_vals)

    def true_rank(v: float) -> float:
        import bisect
        return bisect.bisect_right(all_vals, v) / n

    # default k=200 => ~1.65% rank error at 99% confidence; allow 3x
    for p, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        got = getattr(rows["ALL"], col)
        assert abs(true_rank(got) - p) <= 0.05, (p, got, true_rank(got))
    segs = {r.event_type for r in e.select("event_type").distinct().collect()}
    assert set(rows) == segs | {"ALL"}


def test_sketch_estimates_deterministic(spark):
    """HLL registers and theta's k-smallest-hash retention are order-
    independent => identical estimates per run. KLL is NOT: DataSketches
    KLL compaction picks random offsets, so only its row count/schema
    and rank-error bound are stable (asserted separately)."""
    for name in (
        "sketch_hll_daily_active",
        "sketch_theta_userday_overlap",
    ):
        r1 = [tuple(r) for r in run(spark, name).collect()]
        r2 = [tuple(r) for r in run(spark, name).collect()]
        assert r1 == r2, name


def test_kll_stable_shape_across_runs(spark):
    d1 = run(spark, "sketch_kll_value_quantiles")
    d2 = run(spark, "sketch_kll_value_quantiles")
    r1, r2 = d1.collect(), d2.collect()
    assert d1.schema == d2.schema
    assert [r.segment for r in r1] == [r.segment for r in r2]
    # estimates may differ run-to-run (randomized compaction), but every
    # run must keep each estimate's TRUE RANK near the target quantile.
    # (Value-space comparison would be wrong: at a heavy tail, a 1% rank
    # wobble legitimately moves the p99 VALUE by a lot.)
    import bisect

    e = load_table(spark, SF_DIR, "events")
    by_seg: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        by_seg.setdefault(r.event_type, []).append(r.value)
    by_seg["ALL"] = [v for vs in by_seg.values() for v in vs]
    for vs in by_seg.values():
        vs.sort()
    for rows in (r1, r2):
        for row in rows:
            vals = by_seg[row.segment]
            for p, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
                rank = bisect.bisect_right(vals, getattr(row, col)) / len(vals)
                assert abs(rank - p) <= 0.05, (row.segment, col, rank)
