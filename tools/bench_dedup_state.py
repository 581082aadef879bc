#!/usr/bin/env python
"""Measure streaming-dedup state growth under a MULTI-micro-batch drive
(VERDICT r7 item 1 'Done' criterion: state rows bounded — flat once the
input span exceeds the watermark horizon — at 10x input).

Why a dedicated drive: the registered query drains the whole corpus in
ONE AvailableNow micro-batch (one file per union leg), and Spark only
advances the watermark BETWEEN batches — so its final-batch state count
cannot show expiry regardless of the operator. This tool re-creates the
unbounded-stream conditions the operator is designed for: the events
table is split into K time-ordered files (mtime-ordered so the file
source streams them chronologically), streamed with maxFilesPerTrigger=1
(K micro-batches, watermark advancing each batch), doubled via
self-union (each leg consumes file i in batch i, so every row arrives
twice per batch), and deduplicated two ways:

- bounded:   withWatermark(ts, 1h).dropDuplicatesWithinWatermark(event_id)
             -> state expires at event_ts + 1h; final-batch state is
             O(arrival_rate x horizon), NOT corpus size
- unbounded: dropDuplicates(event_id)  [the pre-r8 registered form]
             -> one state row per distinct key forever

Both variants must emit exactly count(distinct event_id) rows (the
exactly-once contract). The artifact records final-batch state rows for
both at sf0.1 and sf1 (10x input, same 30-day span so 10x arrival rate):
bounded state grows with RATE (~10x smaller than corpus at sf1, and
flat if the rate were held constant); unbounded grows with CORPUS.

Usage: python tools/bench_dedup_state.py [--out BENCH_dedup_state_r8.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def split_time_ordered(spark, sf_dir: str, n_files: int) -> tuple[str, int]:
    """Write the events table as n_files chronologically-ordered parquet
    files with strictly increasing mtimes (the file stream source orders
    by modification time, so micro-batch i is time-slice i)."""
    from makerdao_dw_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").filter("ts IS NOT NULL")
    n = ev.count()
    out = tempfile.mkdtemp(prefix="dedup_state_")
    # ntile over a global ts order gives equal-size contiguous slices
    rows_per = (n + n_files - 1) // n_files
    sliced = ev.orderBy("ts").coalesce(1)
    # one pass: write a single sorted file, then cut it with pyarrow
    tmp_one = tempfile.mkdtemp(prefix="dedup_sorted_")
    sliced.write.mode("overwrite").parquet(tmp_one)
    import pyarrow as pa
    import pyarrow.parquet as pq

    part = [f for f in os.listdir(tmp_one) if f.endswith(".parquet")]
    assert len(part) == 1, part
    tbl = pq.read_table(os.path.join(tmp_one, part[0]))
    # pyarrow defaults re-write the ts column as NTZ nanos, which Spark's
    # file-stream source refuses to read back as `timestamp` (LTZ micros)
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        idx, "ts", tbl.column("ts").cast(pa.timestamp("us", tz="UTC"))
    ).replace_schema_metadata(None)
    for i in range(n_files):
        chunk = tbl.slice(i * rows_per, rows_per)
        if chunk.num_rows == 0:
            break
        path = os.path.join(out, f"slice_{i:04d}.parquet")
        pq.write_table(chunk, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(tmp_one)
    return out, n


def run_variant(spark, src_dir: str, bounded: bool) -> dict:
    """Drive the doubled stream through K micro-batches; return final
    progress state rows + emitted row count + wall."""
    s1 = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    s2 = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    doubled = s1.unionByName(s2)
    if bounded:
        ded = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    else:
        ded = doubled.dropDuplicates(["event_id"])
    name = f"dedup_state_{'b' if bounded else 'u'}_{abs(hash(src_dir)) % 10**6}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_dedup_")
    t0 = time.monotonic()
    q = (
        ded.select("event_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("dedup drive did not finish")
    wall = time.monotonic() - t0
    prog = q.lastProgress
    state = sum(op.get("numRowsTotal", 0) for op in (prog or {}).get("stateOperators", []))
    batches = (prog or {}).get("batchId")
    q.stop()
    emitted = spark.table(name).count()
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "final_state_rows": state,
        "emitted_rows": emitted,
        "micro_batches": (batches + 1) if batches is not None else None,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--sf10-dir", default="/tmp/spark_graft_sf10",
                    help="third decade (100x arrival rate); skipped if absent")
    ap.add_argument("--files", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_dedup_state_r9.json"))
    args = ap.parse_args()

    from makerdao_dw_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bench-dedup-state")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"files_per_stream": args.files, "watermark_horizon": "1 hour"}
    try:
        decades = [("sf0.1", args.sf01_dir), ("sf1", args.sf1_dir)]
        if os.path.isdir(args.sf10_dir):
            decades.append(("sf10", args.sf10_dir))
        for label, d in decades:
            src, n_keys = split_time_ordered(spark, d, args.files)
            bounded = run_variant(spark, src, bounded=True)
            unbounded = run_variant(spark, src, bounded=False)
            shutil.rmtree(src, ignore_errors=True)
            assert bounded["emitted_rows"] == n_keys, (bounded, n_keys)
            assert unbounded["emitted_rows"] == n_keys, (unbounded, n_keys)
            result[label] = {
                "distinct_keys": n_keys,
                "bounded": bounded,
                "unbounded": unbounded,
                "bounded_state_frac_of_corpus": round(
                    bounded["final_state_rows"] / max(n_keys, 1), 4
                ),
            }
    finally:
        spark.stop()
    labels = [lbl for lbl, _ in decades if lbl in result]
    result["summary"] = {
        "bounded_state_ratio_per_decade": {
            f"{a}->{b}": round(
                result[b]["bounded"]["final_state_rows"]
                / max(result[a]["bounded"]["final_state_rows"], 1), 2)
            for a, b in zip(labels, labels[1:])
        },
        "unbounded_state_ratio_per_decade": {
            f"{a}->{b}": round(
                result[b]["unbounded"]["final_state_rows"]
                / max(result[a]["unbounded"]["final_state_rows"], 1), 2)
            for a, b in zip(labels, labels[1:])
        },
        "note": (
            "same 30-day span at every SF -> 10x input = 10x arrival rate; "
            "bounded state tracks rate x horizon (corpus-fraction constant "
            "under rate scaling, and would be FLAT at constant rate), "
            "unbounded tracks corpus cardinality 1:1"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
