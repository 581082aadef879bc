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
