#!/usr/bin/env python
"""Engine-side wall for large-output queries (round 8).

The bench harness (bench.py, bench_second_decade.py) times
`.collect()` — correct for the driver contract, but for queries whose
OUTPUT grows with the corpus (as-of join emits one row per order;
running windows emit one row per event) the sf10 timing is dominated by
serializing 10-15M rows into Python driver objects, not by the plan.
At 100 TB nothing collects to a driver: results land in parquet/sinks.

This tool separates the two: it consumes EVERY output column JVM-side
(xxhash64 over all columns, cast to string for type-uniformity, summed
as decimal so ANSI mode can't overflow) — no column pruning can drop
plan work, no rows cross the JVM/Python boundary. The residual between
bench.py's number and this one is pure driver-materialization cost.

Usage:
  python tools/bench_engine_wall.py [--dirs sf1=/tmp/spark_graft_sf1 \
      sf10=/tmp/spark_graft_sf10] [--out BENCH_engine_wall_r8.json] \
      [queries ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "asof_join_order_events",
    "window_cumulative",
    "window_rank_lag",
    "gap_fill_sequence",
]


def engine_wall(spark, fn, sf_dir: str, n: int = 3) -> float:
    from pyspark.sql import functions as F

    best = None
    for _ in range(n):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
        ).agg(F.sum(F.col("h").cast("decimal(38,0)"))).collect()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        nargs="+",
        default=["sf1=/tmp/spark_graft_sf1", "sf10=/tmp/spark_graft_sf10"],
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_engine_wall_r9.json"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or QUERIES
    dirs = [d.split("=", 1) for d in args.dirs]

    from makerdao_dw_spark.queries import queries_dict
    from makerdao_dw_spark.session import get_spark

    spark = get_spark("bench-engine-wall")
    spark.sparkContext.setLogLevel("ERROR")
    qd = queries_dict()
    result: dict = {}
    try:
        for label, d in dirs:
            result[label] = {n: engine_wall(spark, qd[n], d, n=args.reps) for n in names}
    finally:
        spark.stop()
    if len(dirs) == 2:
        a, b = dirs[0][0], dirs[1][0]
        result[f"engine_ratio_{b}_over_{a}"] = {
            n: round(result[b][n] / result[a][n], 2) for n in names
        }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
