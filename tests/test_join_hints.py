"""Join-strategy hint surface: the engine must honor each Spark join
hint with the corresponding physical operator — the knobs a user turns
when AQE's choice is wrong at 100 TB (e.g. forcing a shuffled-hash join
for a large-but-uniform build side where sort-merge's double sort is
pure waste, or pinning a broadcast under the auto threshold)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _joined(spark, hint):
    a = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    return a.join(b.hint(hint), "k")


def _plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_hint(spark):
    p = _plan(_joined(spark, "broadcast"))
    assert "BroadcastHashJoin" in p, p[:1500]


def test_shuffle_hash_hint(spark):
    p = _plan(_joined(spark, "shuffle_hash"))
    assert "ShuffledHashJoin" in p, p[:1500]


def test_merge_hint(spark):
    p = _plan(_joined(spark, "merge"))
    assert "SortMergeJoin" in p, p[:1500]


def test_shuffle_replicate_nl_hint(spark):
    a = spark.range(0, 50).select(F.col("id").alias("ka"))
    b = spark.range(0, 50).select(F.col("id").alias("kb"))
    df = a.join(b.hint("shuffle_replicate_nl"))
    p = _plan(df)
    assert "CartesianProduct" in p, p[:1500]
