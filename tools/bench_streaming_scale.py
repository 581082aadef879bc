#!/usr/bin/env python
"""Streaming scale curve (VERDICT r6 item 4): run the registered
streaming queries at sf0.1 and sf1 (10x input) and record wall ratios
plus the state-store row counts of the final micro-batch.

Bounded-state claim under test: every stateful streaming query here
carries a watermark, so state is bounded by the *live* window/session
population, not corpus size — at 10x input the wall should grow at
most ~linearly (more rows through the same bounded state) and the
final state row count should grow with key/window cardinality, never
superlinearly. The memory-sink drain runs the whole bounded input as a
sequence of micro-batches (availableNow), so this measures the real
stateful path, not a batch rewrite.

Usage: python tools/bench_streaming_scale.py [--sf1-dir /tmp/spark_graft_sf1]
    [--out BENCH_streaming_sf1_r7.json] [queries ...]
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
    "streaming_windowed_counts",
    "streaming_hopping_counts",
    "streaming_session_windows",
    "streaming_static_join",
    "streaming_stream_stream_join",
    "streaming_dedup",
]


def bench_dir(spark, sf_dir: str, names: list[str], n: int = 2) -> tuple[dict, dict]:
    from makerdao_dw_spark.queries import queries_dict
    from makerdao_dw_spark.streaming import jobs

    qd = queries_dict()
    walls, states = {}, {}
    for name in names:
        best = None
        for _ in range(n):
            jobs.LAST_STATE_ROWS.clear()
            t0 = time.monotonic()
            qd[name](spark, sf_dir).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        walls[name] = round(best, 3)
        states[name] = sum(jobs.LAST_STATE_ROWS.values())
    return walls, states


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_streaming_sf1_r7.json"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or QUERIES

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    # This harness measures POST-EVICTION state (the bounded-state
    # claim); the drain skips the trailing watermark/eviction batch by
    # default (r11 perf), so re-enable it here.
    spark.conf.set("spark.makerdao.streaming.drain.finalWatermarkBatch", "true")
    try:
        w01, s01 = bench_dir(spark, args.sf01_dir, names)
        w1, s1 = bench_dir(spark, args.sf1_dir, names)
    finally:
        spark.stop()
    ratios = {k: round(w1[k] / w01[k], 2) for k in w01}
    state_ratios = {
        k: (round(s1[k] / s01[k], 2) if s01.get(k) else None) for k in s01
    }
    result = {
        "sf0.1": w01,
        "sf1": w1,
        "wall_ratio_10x_data": ratios,
        "state_rows_sf0.1": s01,
        "state_rows_sf1": s1,
        "state_ratio_10x_data": state_ratios,
        "gate": "<= ~12x wall at 10x input; state grows with live key/window cardinality, never superlinearly",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
