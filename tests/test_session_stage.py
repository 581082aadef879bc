"""Lifecycle tests for session.stage() / drop_materialized() / gc_hint()
(round 9): the staged-parquet lineage cut that bounds iterative queries'
shuffle scratch (LPA, prefix-filter Jaccard — see SCALE.md sf100 rows).

The load-bearing contract is the TWO-generation deletion: a staged file
is read lazily by the returned DataFrame (and possibly re-read by a
straggler consumer after the query function returns), and a deleted
stage file is a FileNotFound, not a recompute — so staged dirs must
survive exactly one release cycle longer than caches."""

from __future__ import annotations

import os

from makerdao_dw_spark import session as S


def _staged_dirs() -> list[str]:
    with S._MATERIALIZED_LOCK:
        return [d for _, d in S._STAGED_LIVE] + [d for _, d in S._STAGED_PENDING]


def test_stage_roundtrip_and_two_generation_deletion(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    before = set(_staged_dirs())
    staged = S.stage(df, "unit")
    new = [d for d in _staged_dirs() if d not in before]
    assert len(new) == 1, "stage() must register exactly one temp dir"
    d = new[0]
    assert os.path.isdir(d)
    # value identity
    assert sorted(tuple(r) for r in staged.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # generation 1: dir survives the first release (live -> pending)
    S.release_materialized()
    assert os.path.isdir(d), "staged dir must survive one release cycle"
    # the staged frame is still readable (the straggler-consumer case)
    assert staged.count() == 100
    # generation 2: second release deletes it
    S.release_materialized()
    assert not os.path.exists(d), "staged dir must be deleted after two cycles"


def test_drop_materialized_releases_early(spark):
    df = S.materialize(spark.range(50).selectExpr("id"))
    assert df.storageLevel.useMemory or df.storageLevel.useDisk
    with S._MATERIALIZED_LOCK:
        assert any(m is df for _, m in S._MATERIALIZED)
    S.drop_materialized(df)
    with S._MATERIALIZED_LOCK:
        assert not any(m is df for _, m in S._MATERIALIZED)
    # unpersisted: storage level is NONE (no memory, no disk)
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    # recompute still correct (lineage intact — drop only costs recompute)
    assert df.count() == 50


def test_gc_hint_is_safe_noop(spark):
    # best-effort: must never raise, with or without an active session
    S.gc_hint(spark)


def test_stage_dirs_are_thread_owned(spark):
    """A release on another thread must not delete this thread's staged
    dirs (same owner-tagging rule as materialize)."""
    import threading

    before = set(_staged_dirs())
    S.stage(spark.range(10), "owned")
    mine = [d for d in _staged_dirs() if d not in before]
    assert len(mine) == 1

    t = threading.Thread(target=S.release_materialized)
    t.start()
    t.join()
    assert os.path.isdir(mine[0]), "other-thread release must not touch my dirs"
    # clean up: two releases on THIS thread
    S.release_materialized()
    S.release_materialized()
    assert not os.path.exists(mine[0])
