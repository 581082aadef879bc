#!/usr/bin/env python
"""Scale curve for the round-4 operators: run each new heavy query at
sf0.1 and at sf1 (tools/gen_scale_data.py corpus, 10x rows) on the same
host and report per-query wall ratios. Same interpretation gate as
tools/bench_scale_curve.py: <= ~12x wall at 10x data = healthy
(linear + constant overhead); super-linear = quadratic expansion or a
lost pushdown. Writes BENCH_r4_ops_sf1.json at the repo root.

Usage: python tools/bench_new_ops_scale.py [--sf1-dir /tmp/spark_graft_sf1]
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
    "pagerank_copurchase",
    "dedup_prefix_filter_jaccard",
    "dedup_apply_clusters",
    "dedup_incremental_batch",
    "dedup_simhash_hamming",
    "lm_bigram_doc_score",
    "embedding_covariance_pairs",
    "ann_quantized_rescore",
    "attribution_multi_touch",
    "event_pattern_match",
    "cogroup_order_event_stats",
    "seasonal_decompose_dow",
]


def bench_dir(spark, sf_dir: str, n: int = 2, names: list[str] | None = None) -> dict:
    from makerdao_dw_spark.queries import queries_dict

    qd = queries_dict()
    out = {}
    for name in names or QUERIES:
        best = None
        for _ in range(n):
            t0 = time.monotonic()
            qd[name](spark, sf_dir).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_r4_ops_sf1.json"))
    ap.add_argument("queries", nargs="*", help="query names (default: the round-4 list)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    try:
        b01 = bench_dir(spark, args.sf01_dir, names=args.queries)
        b1 = bench_dir(spark, args.sf1_dir, names=args.queries)
    finally:
        spark.stop()
    ratios = {k: round(b1[k] / b01[k], 2) for k in b01}
    result = {
        "sf0.1": b01,
        "sf1": b1,
        "wall_ratio_10x_data": ratios,
        "gate": "<= ~12x healthy at 10x data on fixed cores",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
