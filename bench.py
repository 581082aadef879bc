#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query is timed to full
materialization (count via noop write semantics: collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from makerdao_dw_spark.queries import REGISTRY  # noqa: E402
from makerdao_dw_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suite: one representative per operator family.
HEADLINE = [
    "flagship_events_funnel",   # the reference's analytics plan shape
    "q1_pricing_summary",       # scan + hash aggregate
    "multiway_join_revenue",    # 5-way join
    "asof_join_order_events",   # as-of join (union + LOCF window)
    "window_cumulative",        # partitioned running window
    "window_rank_lag",          # rank/lag window family
    "gap_fill_sequence",        # sequence explode
    "dedup_exact",              # hash dedup
    "dedup_minhash_lsh",        # shingle->minhash->band join
    "dedup_connected_components",  # iterative component clustering
    "ann_bruteforce_topk",      # vector similarity
    "text_quality_stats",       # text featurization
    "text_tfidf_topterms",      # two-phase term statistics
    "salted_skew_aggregate",    # skew-salted aggregation
    "streaming_windowed_counts",  # structured-streaming windowed agg
]


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("makerdao-dw-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: JVM/codegen/parquet-footer paths, not query work.
    from makerdao_dw_spark.session import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        # min of 3: the first run pays codegen/JIT, and this box's
        # host-level noise swings single runs up to 5x — the min is the
        # steady-state throughput number (what a cluster would see).
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
            assert rows is not None
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
