"""Independent pure-Python reference checks for the math-heavy wave
15-22 operators.

The DuckDB oracles prove CROSS-ENGINE agreement; these tests prove the
MATH, against straight-line Python implementations of the published
algorithms (Kaplan-Meier product-limit, Holt recurrence, Theil-Sen
medians, Goh-Barabasi burstiness) on randomized corpora — a shared
formulation bug in both SQL twins cannot hide from a third,
independently-written implementation (the round-1 lesson: "shared
Spark+oracle formulations hide shared math bugs")."""

from __future__ import annotations

import datetime
import math
import os
import random
import statistics

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from makerdao_dw_spark.queries import queries_dict

from .conftest import SF_DIR

QUERIES = queries_dict()


def _write_events(d, rows):
    schemas = {
        t: pq.read_schema(os.path.join(SF_DIR, f"{t}.parquet"))
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        )
    }
    for t, schema in schemas.items():
        tbl = pa.table(rows, schema=schema) if t == "events" else schema.empty_table()
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def _random_events(seed, n_users=25, max_ev=8):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    rows = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}
    eid = 1
    for u in range(1, n_users + 1):
        for _ in range(rng.randint(1, max_ev)):
            rows["event_id"].append(eid)
            rows["ts"].append(t0 + datetime.timedelta(minutes=rng.randint(0, 40 * 24 * 60)))
            rows["user_id"].append(u)
            rows["event_type"].append(rng.choice(["view", "click", "purchase"]))
            rows["value"].append(round(rng.uniform(0.5, 9.5), 2))
            rows["props"].append("{}")
            eid += 1
    return rows


@pytest.mark.parametrize("seed", [7, 23])
def test_kaplan_meier_vs_product_limit_reference(spark, tmp_path_factory, seed):
    """KM survival must equal the textbook product-limit estimator
    computed row-by-row in Python from the same spans."""
    d = tmp_path_factory.mktemp(f"km_ref_{seed}")
    rows = _random_events(seed)
    _write_events(d, rows)

    # reference: per-user spans, censor rule, product-limit
    per_user = {}
    for ts, u in zip(rows["ts"], rows["user_id"]):
        lo, hi = per_user.get(u, (ts, ts))
        per_user[u] = (min(lo, ts), max(hi, ts))
    gmax = max(hi.date() for _, hi in per_user.values())
    spans = [
        (
            (hi.date() - lo.date()).days,
            1 if (gmax - hi.date()).days > 7 else 0,
        )
        for lo, hi in per_user.values()
    ]
    times = sorted({t for t, _ in spans})
    surv, expected = 1.0, {}
    for t in times:
        n_risk = sum(1 for tt, _ in spans if tt >= t)
        d_t = sum(c for tt, c in spans if tt == t and c)
        surv *= 1.0 - d_t / n_risk
        expected[t] = surv

    got = {
        r["t_days"]: r["survival"]
        for r in QUERIES["kaplan_meier_churn"](spark, str(d)).collect()
    }
    assert set(got) == set(expected)
    for t in expected:
        assert got[t] == pytest.approx(expected[t], abs=2e-6), (t, got[t], expected[t])


@pytest.mark.parametrize("seed", [11, 42])
def test_holt_vs_python_recurrence(spark, tmp_path_factory, seed):
    """The aggregate() fold must reproduce the straight-line Holt
    recurrence (alpha=0.5, beta=0.25) on the same daily totals."""
    d = tmp_path_factory.mktemp(f"holt_ref_{seed}")
    rows = _random_events(seed)
    _write_events(d, rows)

    daily = {}
    for ts, v in zip(rows["ts"], rows["value"]):
        # mirror the query's exact-decimal daily sum at 6 dp
        daily[ts.date()] = round(daily.get(ts.date(), 0.0) + v, 6)
    ys = [daily[k] for k in sorted(daily)]
    assert len(ys) >= 2
    level, trend = ys[1], ys[1] - ys[0]
    for y in ys[2:]:
        new_level = 0.5 * y + 0.5 * (level + trend)
        trend = 0.25 * (new_level - level) + 0.75 * trend
        level = new_level

    got = QUERIES["holt_linear_forecast"](spark, str(d)).collect()
    assert len(got) == 7
    for r in got:
        assert r["forecast"] == pytest.approx(level + r["h"] * trend, abs=2e-6)


@pytest.mark.parametrize("seed", [5, 17])
def test_theil_sen_vs_python_medians(spark, tmp_path_factory, seed):
    """Theil-Sen slope/intercept must equal statistics.median over the
    explicitly enumerated pairwise slopes."""
    d = tmp_path_factory.mktemp(f"ts_ref_{seed}")
    rows = _random_events(seed)
    _write_events(d, rows)

    daily = {}
    for ts, v in zip(rows["ts"], rows["value"]):
        daily[ts.date()] = round(daily.get(ts.date(), 0.0) + v, 6)
    days = sorted(daily)
    x0 = days[0]
    xy = [((k - x0).days, daily[k]) for k in days]
    slopes = [
        (yb - ya) / (xb - xa) for i, (xa, ya) in enumerate(xy)
        for xb, yb in xy[i + 1:]
    ]
    slope = statistics.median(slopes)
    intercept = statistics.median(y - slope * x for x, y in xy)

    r = QUERIES["theil_sen_trend"](spark, str(d)).collect()[0]
    assert r["n_days"] == len(xy)
    assert r["n_pairs"] == len(slopes)
    assert r["slope"] == pytest.approx(slope, abs=2e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=2e-6)


@pytest.mark.parametrize("seed", [3, 29])
def test_burstiness_vs_python_moments(spark, tmp_path_factory, seed):
    """Goh-Barabasi burstiness must equal the straight-line per-user
    (sigma - mu) / (sigma + mu) over integer-second gaps."""
    d = tmp_path_factory.mktemp(f"burst_ref_{seed}")
    rows = _random_events(seed)
    _write_events(d, rows)

    per_user = {}
    order = sorted(
        zip(rows["user_id"], rows["ts"], rows["event_id"]),
        key=lambda r: (r[0], r[1], r[2]),
    )
    for u, ts, _ in order:
        per_user.setdefault(u, []).append(ts)
    expected = {}
    for u, tss in per_user.items():
        gaps = [
            int((b - a).total_seconds()) for a, b in zip(tss, tss[1:])
        ]
        if len(gaps) < 2:
            continue
        mu = sum(gaps) / len(gaps)
        sigma = math.sqrt(
            sum((g - mu) ** 2 for g in gaps) / (len(gaps) - 1)
        )
        expected[u] = None if sigma + mu == 0 else (sigma - mu) / (sigma + mu)

    got = {
        r["user_id"]: r["burstiness"]
        for r in QUERIES["user_interarrival_burstiness"](spark, str(d)).collect()
    }
    assert set(got) == set(expected)
    for u, b in expected.items():
        if b is None:
            assert got[u] is None
        else:
            assert got[u] == pytest.approx(b, abs=2e-6), (u, got[u], b)
