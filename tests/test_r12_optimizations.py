"""r12 optimization-round pins (VERDICT r11 items 3 and 5):

- the recursive-CTE loop confs (AQE off, shrunken shuffle partitions)
  must be restored by the query itself, not by the NEXT query's
  configure() — a non-registry consumer must never inherit them;
- the streaming drains' trailing no-data micro-batch removal must be
  sink-invariant: every drain returns identical rows with
  spark.makerdao.streaming.drain.finalWatermarkBatch on and off.
"""

from __future__ import annotations

import pytest

from makerdao_dw_spark.queries import queries_dict


def test_recursive_cte_restores_session_confs(spark, sf_dir):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    df = queries_dict()["recursive_cte_reachability"](spark, sf_dir)
    # the loop executes inside the query fn (staged); both confs must
    # already be back BEFORE any consumer touches the returned frame
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    # and the returned frame is conf-independent: executing it changes
    # nothing and yields rows
    assert df.count() > 0
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"


STREAMING = [
    "streaming_windowed_counts",
    "streaming_hopping_counts",
    "streaming_session_windows",
    "streaming_stateful_user_stats",
    "streaming_dedup",
    "streaming_static_join",
    "streaming_stream_stream_join",
]


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_final_watermark_batch_sink_invariant(spark, sf_dir, name):
    """The r11 drain change skips the eviction-only trailing micro-batch;
    the sink rows must be IDENTICAL either way for every registered
    drain (the one semantics-adjacent r11 change — VERDICT r11 item 5)."""
    qd = queries_dict()
    conf = "spark.makerdao.streaming.drain.finalWatermarkBatch"
    try:
        spark.conf.set(conf, "false")
        without = sorted(tuple(r) for r in qd[name](spark, sf_dir).collect())
        spark.conf.set(conf, "true")
        with_batch = sorted(tuple(r) for r in qd[name](spark, sf_dir).collect())
    finally:
        spark.conf.unset(conf)
    assert without == with_batch
    assert len(without) > 0


# --------------------------------------------------------------------------
# VERDICT r11 item 8: _scan_splits probes row groups, not just files
# --------------------------------------------------------------------------
def _write_parquet(tmp_path, name, n_rows, row_group_size):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / name)
    pq.write_table(
        pa.table({"id": list(range(n_rows))}), p, row_group_size=row_group_size
    )
    return p


def test_scan_splits_counts_row_groups(tmp_path):
    from makerdao_dw_spark.session import _scan_splits

    single = _write_parquet(tmp_path, "one.parquet", 100, 100)
    multi = _write_parquet(tmp_path, "two.parquet", 100, 50)
    assert _scan_splits(single) == 1
    assert _scan_splits(multi) == 2


def test_spread_skips_multi_row_group_single_file(spark, tmp_path):
    """A single file with >= parallelism row groups splits by
    maxPartitionBytes on its own — load_table must NOT add the
    round-robin exchange (which would shuffle the whole table for
    nothing)."""
    from makerdao_dw_spark.session import load_table

    par = spark.sparkContext.defaultParallelism
    _write_parquet(tmp_path, "t.parquet", par * 10, 10)  # par row groups
    df = load_table(spark, str(tmp_path), "t", spread=True)
    assert "Repartition" not in df._jdf.queryExecution().optimizedPlan().toString()
    # the unsplittable single-row-group layout still gets the spread
    _write_parquet(tmp_path, "u.parquet", par * 10, par * 10)
    df2 = load_table(spark, str(tmp_path), "u", spread=True)
    assert "Repartition" in df2._jdf.queryExecution().optimizedPlan().toString()
