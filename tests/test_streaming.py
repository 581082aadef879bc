"""Streaming plane tests: the checkpointed incremental ingest (exactly-
once resume across restarts — the Structured-Streaming replacement for
the reference's max(block_number) probe) and multi-batch stateful
accumulation. The windowed/session/stateful query results themselves
are oracle-gated in test_queries_oracle via the registry."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from makerdao_dw_spark.ingest.fixtures import VAT_ADDRESS, maker_chain, maker_specs
from makerdao_dw_spark.ingest.pipeline import fetch_raw_logs
from makerdao_dw_spark.streaming.jobs import stream_ingest_logs


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Two waves of raw logs landing as separate files."""
    d = tmp_path_factory.mktemp("landing")
    chain = maker_chain(head=600)
    w1 = fetch_raw_logs(spark, chain, [VAT_ADDRESS], 0, 299, step=100)
    w2 = fetch_raw_logs(spark, chain, [VAT_ADDRESS], 300, 599, step=100)
    return str(d), w1, w2


def test_incremental_ingest_resumes_from_checkpoint(spark, landing, tmp_path):
    landing_dir, w1, w2 = landing
    out = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    vat_specs, _ = maker_specs()
    frob = [s for s in vat_specs if s.table == "vat_call_frob"]

    # wave 1 lands; first run drains it
    w1.coalesce(1).write.mode("append").parquet(landing_dir)
    stream_ingest_logs(spark, landing_dir, frob, out, "makermcd", ckpt, partition_blocks=200)
    p = os.path.join(out, "makermcd", "vat_call_frob")
    n1 = spark.read.parquet(p).count()
    assert n1 > 0

    # restart with same checkpoint, nothing new -> no duplicates
    stream_ingest_logs(spark, landing_dir, frob, out, "makermcd", ckpt, partition_blocks=200)
    assert spark.read.parquet(p).count() == n1

    # wave 2 lands; restart processes ONLY the new file
    w2.coalesce(1).write.mode("append").parquet(landing_dir)
    stream_ingest_logs(spark, landing_dir, frob, out, "makermcd", ckpt, partition_blocks=200)
    df = spark.read.parquet(p)
    n2 = df.count()
    assert n2 > n1
    # no row duplicated across the three runs
    assert df.dropDuplicates(["block_number", "log_index"]).count() == n2
    # both waves' block ranges present
    mn, mx = df.agg({"block_number": "min"}).first()[0], df.agg({"block_number": "max"}).first()[0]
    assert mn < 300 <= mx


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState must carry state across micro-batches:
    feed the same keys in two files with maxFilesPerTrigger=1 and check
    totals equal the union, not the last batch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from makerdao_dw_spark.streaming.jobs import _STATE, _STATE_OUT, _update_user_stats

    d = tmp_path / "ev"
    d.mkdir()
    ts = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {"user_id": [1, 1, 2], "value": [1.0, 5.0, 2.0], "ts": [ts, ts, ts]}
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "a.parquet")
    pd.DataFrame(
        {"user_id": [1, 2], "value": [9.0, 0.5], "ts": [ts + pd.Timedelta("1h")] * 2}
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "b.parquet")

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(d))
    )
    st = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats, _STATE_OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
    name = "stateful_mb_test"
    q = (
        st.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    out = spark.table(name)
    # last emission per key = accumulated state over BOTH batches
    final = {
        r["user_id"]: r
        for r in out.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rk = 1")
        .collect()
    }
    assert final[1]["n_events"] == 3 and final[1]["max_value"] == 9.0
    assert final[2]["n_events"] == 2 and final[2]["min_value"] == 0.5


def test_transform_with_state_gated(spark):
    """transformWithStateInPandas (Spark 4 StatefulProcessor API): runs
    for real where protobuf exists; in this container the gate must
    refuse cleanly (the legacy-API twin above covers the semantics)."""
    import pytest

    from makerdao_dw_spark.streaming.transform_state import (
        TypeStatsProcessor,
        protobuf_available,
        transform_with_state_type_stats,
    )

    # the processor itself is plain Python — state transition is testable
    # without the streaming runtime
    class FakeState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeState()

    import pandas as pd

    p = TypeStatsProcessor()
    p.init(FakeHandle())
    out1 = list(p.handleInputRows(("buy",), iter([pd.DataFrame({"value": [2.0, 5.0]})]), None))
    out2 = list(p.handleInputRows(("buy",), iter([pd.DataFrame({"value": [1.0]})]), None))
    assert out1[0].iloc[0]["n"] == 2 and out1[0].iloc[0]["max_value"] == 5.0
    # state carried across calls: count accumulates, min tightens
    assert out2[0].iloc[0]["n"] == 3 and out2[0].iloc[0]["min_value"] == 1.0

    if not protobuf_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            transform_with_state_type_stats(spark, "/root/testdata/sf0.001")
        pytest.skip("protobuf absent: TWS cannot execute in this container")
    df = transform_with_state_type_stats(spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_streaming_datasource_offsets_and_resume(spark, tmp_path):
    """The ethblocks_stream Python DataSource must (a) deliver every
    block exactly once across rate-limited micro-batches, (b) match the
    batch DataSource row-for-row, and (c) resume from checkpointed
    offsets — a restart with the same checkpoint re-reads nothing
    (A14's max-probe resume, engine-native)."""
    import os

    from makerdao_dw_spark.ingest.datasource import read_blocks_source, read_blocks_stream

    head = 1499
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    stream = read_blocks_stream(spark, from_block=0, to_block=head, blocks_per_trigger=600)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == head + 1
    # rate limiting actually split the work: >1 micro-batch committed
    commits = [f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")]
    assert len(commits) >= 2, commits
    # parity with the batch DataSource
    batch = read_blocks_source(spark, 0, head, step=100)
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0

    # restart on the same checkpoint: offsets say head is reached -> no new rows
    q2 = (
        read_blocks_stream(spark, from_block=0, to_block=head, blocks_per_trigger=600)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == head + 1


def test_serving_table_upsert_exactly_once(spark, tmp_path):
    """stream_serving_aggregates: totals match a batch recompute after
    incremental drains, a checkpointed re-run with no new data changes
    nothing, and replaying an already-applied update is a no-op (the
    update-mode + MERGE design is idempotent by construction)."""
    import os

    from pyspark.sql import functions as F

    from makerdao_dw_spark.io.merge import merge_dataframes
    from makerdao_dw_spark.session import load_table
    from makerdao_dw_spark.streaming.jobs import stream_serving_aggregates

    from .conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events").select("user_id", "value")
    landing = str(tmp_path / "landing")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    first = events.filter(F.col("user_id") % 2 == 0)
    first.write.mode("overwrite").parquet(os.path.join(landing, "f1"))
    schema = spark.read.parquet(os.path.join(landing, "f1")).schema

    def expected(df):
        return {
            r.user_id: (r.n, str(r.s))
            for r in df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
            )
            .collect()
        }

    def serving_state():
        return {
            r.user_id: (r.n_events, str(r.sum_value))
            for r in spark.read.parquet(serving).collect()
        }

    stream_serving_aggregates(spark, landing, schema, serving, ckpt)
    assert serving_state() == expected(first)

    # drain a second incremental file: totals must cover BOTH files
    events.filter(F.col("user_id") % 2 == 1).write.mode("overwrite").parquet(
        os.path.join(landing, "f2")
    )
    stream_serving_aggregates(spark, landing, schema, serving, ckpt)
    assert serving_state() == expected(events)

    # checkpointed re-run with nothing new: no change
    stream_serving_aggregates(spark, landing, schema, serving, ckpt)
    assert serving_state() == expected(events)

    # simulate an at-least-once replay: re-applying the full totals
    # upsert over the current serving table must be a no-op
    replay = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value"),
        )
    )
    merged = merge_dataframes(spark.read.parquet(serving), replay, ["user_id"])
    assert {
        r.user_id: (r.n_events, str(r.sum_value)) for r in merged.collect()
    } == expected(events)


def test_rocksdb_state_store_matches_default(spark):
    """The RocksDB state store provider (the 100 TB choice: state spills
    to local disk instead of living on the executor heap) produces
    byte-identical windowed-aggregation results to the default provider.
    Provider is picked per-query at checkpoint creation, so flipping the
    conf between runs is safe with fresh checkpoints."""
    from makerdao_dw_spark.streaming.jobs import run_windowed_counts

    from .conftest import SF_DIR

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    base = [tuple(r) for r in run_windowed_counts(spark, SF_DIR).collect()]
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        rocks = [tuple(r) for r in run_windowed_counts(spark, SF_DIR).collect()]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert sorted(base) == sorted(rocks)


def test_stream_table_reads_directory_shaped_tables(spark, tmp_path):
    """Scaled/production corpora ship tables as part-file DIRECTORIES
    (name.parquet/part-*.parquet); the file-stream source does not
    recurse, so before the round-4 fix stream_table silently drained 0
    rows from them. Both layouts must yield the full table."""
    from makerdao_dw_spark.streaming.sources import stream_table
    from makerdao_dw_spark.streaming.jobs import _drain

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = src.count()
    d = str(tmp_path / "scaled")
    src.repartition(4).write.parquet(os.path.join(d, "events.parquet"))

    got = _drain(stream_table(spark, d, "events").groupBy().count(), "complete")
    assert got.collect()[0][0] == n


def test_stream_table_reads_hive_partitioned_tables(spark, tmp_path):
    """The repo's own ingest sink writes partitionBy(...) subdirectories
    (name.parquet/key=value/part-*.parquet). Spark's file-stream source
    DOES recurse into key=value partition dirs (partition discovery), so
    stream_table must yield the full table WITH the partition column —
    pinned here because an advisory flagged this layout as a suspected
    silent-0-rows path (it is not; this test keeps it that way)."""
    from pyspark.sql import functions as F

    from makerdao_dw_spark.streaming.jobs import _drain
    from makerdao_dw_spark.streaming.sources import stream_table

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = src.count()
    d = str(tmp_path / "parted")
    src.withColumn("block_range", F.pmod(F.col("event_id"), F.lit(4))).write.partitionBy(
        "block_range"
    ).parquet(os.path.join(d, "events.parquet"))

    df = stream_table(spark, d, "events")
    assert "block_range" in df.columns  # partition column discovered
    by_part = {
        r["block_range"]: r["n"]
        for r in _drain(
            df.groupBy("block_range").agg(F.count("*").alias("n")), "complete"
        ).collect()
    }
    assert sum(by_part.values()) == n and len(by_part) == 4


def test_stream_table_nested_nonpartition_dir_fails_loudly(spark, tmp_path):
    """A table dir nested in a NON key=value way (no partition discovery
    possible) must raise at open time — never silently drain 0 rows."""
    import pytest
    from pyspark.errors import AnalysisException

    from makerdao_dw_spark.streaming.sources import stream_table

    d = str(tmp_path / "nested")
    inner = os.path.join(d, "events.parquet", "nested")
    spark.range(5).write.parquet(os.path.join(inner, "inner.parquet"))
    with pytest.raises(AnalysisException):
        stream_table(spark, d, "events")


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the bounded-state form of
    streaming dedup — duplicate event_ids arriving within the watermark
    horizon are dropped, and (unlike plain dropDuplicates) the key
    state EXPIRES once the watermark passes, so a 100 TB stream's dedup
    state is horizon-bounded instead of unbounded."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from makerdao_dw_spark.streaming.jobs import _drain
    from makerdao_dw_spark.streaming.sources import stream_table

    t0 = datetime.datetime(2024, 1, 1)
    rows = {
        "event_id": [1, 1, 2, 2, 3],
        "ts": [t0, t0 + datetime.timedelta(minutes=5), t0, t0, t0 + datetime.timedelta(hours=1)],
        "user_id": [10, 10, 20, 20, 30],
        "event_type": ["click"] * 5,
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    }
    d = str(tmp_path)
    pq.write_table(pa.table(rows), os.path.join(d, "events.parquet"))

    ev = stream_table(spark, d, "events")
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = _drain(deduped.select("event_id"), "append")
    got = sorted(r.event_id for r in out.collect())
    assert got == [1, 2, 3], got
