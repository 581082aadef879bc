#!/usr/bin/env python
"""Full-registry decade sweep (round 8): EVERY registered query timed
at sf0.1 and sf1 (10x data), min-of-2, one session.

Prior rounds measured the headline suite plus each wave's new
operators; this sweeps the whole surface so no query's first-decade
curve is unmeasured. Output is sorted by wall ratio, worst first, with
the known benign classes annotated downstream in SCALE.md:

- output-proportional queries are driver-collect-bound at the top end
  (see tools/bench_engine_wall.py — the plan is linear, serializing
  N rows to Python is the harness cost);
- sub-second sf0.1 walls inflate ratios (fixed overhead amortizing);
  the ratio matters when the sf1 wall is also material (> ~5 s).

Usage: python tools/bench_registry_sweep.py [--out BENCH_registry_sweep_r8.json]
    [--sf01-dir ...] [--sf1-dir ...] [queries ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_registry_sweep_r8.json"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from makerdao_dw_spark.queries import queries_dict
    from makerdao_dw_spark.session import get_spark

    spark = get_spark("bench-registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qd = queries_dict()
    names = args.queries or sorted(qd)

    def run(sf_dir: str) -> dict:
        out = {}
        for i, name in enumerate(names):
            best = None
            err = None
            for _ in range(2):
                t0 = time.monotonic()
                try:
                    qd[name](spark, sf_dir).collect()
                except Exception as e:  # noqa: BLE001
                    err = str(e)[:80]
                    break
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            # an error on ANY iteration marks the query failed — a query
            # that succeeds once then dies must not report a clean timing
            out[name] = f"error: {err}" if err is not None else round(best, 3)
            print(f"[{i + 1}/{len(names)}] {sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}", flush=True)
        return out

    try:
        w01 = run(args.sf01_dir)
        w1 = run(args.sf1_dir)
    finally:
        spark.stop()

    rows = []
    for n in names:
        a, b = w01.get(n), w1.get(n)
        ratio = round(b / a, 2) if isinstance(a, float) and isinstance(b, float) and a > 0 else None
        rows.append({"query": n, "sf0.1_s": a, "sf1_s": b, "ratio_10x": ratio})
    rows.sort(key=lambda r: -(r["ratio_10x"] or 0))
    result = {
        "n_queries": len(names),
        "total_sf0.1_s": round(sum(v for v in w01.values() if isinstance(v, float)), 1),
        "total_sf1_s": round(sum(v for v in w1.values() if isinstance(v, float)), 1),
        "gate": "ratio <= ~12x healthy at 10x data on fixed cores; "
        "investigate material sf1 walls with ratio > 12",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    for r in rows[:15]:
        print(r)


if __name__ == "__main__":
    main()
