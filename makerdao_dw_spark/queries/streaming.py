"""Streaming-executed queries, oracle-checked against batch SQL.

These run REAL Structured Streaming plans (file-stream source →
watermark → windowed/sessionized/stateful aggregation → memory sink,
drained with AvailableNow) and return the materialized result. The
DuckDB oracles are the batch-equivalent answers — streaming and batch
must agree on a bounded input, which is exactly what these check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (
    run_sessionized,
    run_stateful_user_stats,
    run_stream_dedup,
    run_stream_static_join,
    run_stream_stream_join,
    run_windowed_counts,
)
from .registry import query


@query(
    "streaming_windowed_counts",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       COUNT(*) AS n,
       SUM(CAST(value AS DECIMAL(38,6))) AS total_value
FROM events
WHERE ts IS NOT NULL  -- watermarked jobs drop rows with no event time
GROUP BY 1, 2
ORDER BY day, event_type
""",
    tags=("streaming", "watermark", "window"),
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_windowed_counts(spark, sf_dir)


@query(
    "streaming_hopping_counts",
    oracle="""
WITH bounds AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, MIN(ts)) AS t0, MAX(ts) AS t1 FROM events
), starts AS (
  SELECT UNNEST(generate_series(
           (SELECT t0 FROM bounds) - INTERVAL 30 MINUTE,
           (SELECT t1 FROM bounds),
           INTERVAL 30 MINUTE)) AS w_start
), hits AS (
  SELECT s.w_start, e.event_type, e.value
  FROM events e JOIN starts s
    ON e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL 60 MINUTE
)
SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS total_value
FROM hits
GROUP BY w_start, event_type
ORDER BY w_start, event_type
""",
    tags=("streaming", "hopping-window", "watermark"),
)
def streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `hopping_window_counts`: the same 60/30-minute
    multi-assign windows computed by Structured Streaming with a 1-hour
    watermark (state keyed by (window, type), bounded by the watermark) —
    completing the streaming window family: tumbling, session, hopping."""
    from ..streaming.jobs import run_hopping_counts

    return run_hopping_counts(spark, sf_dir)


@query(
    "streaming_session_windows",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR ts - LAG(ts) OVER w >= INTERVAL 4 HOUR
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL  -- watermarked jobs drop rows with no event time
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 4 HOUR AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    tags=("streaming", "session-window"),
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ``session_window`` splits when the gap is >= the 4h
    duration (windows are [start, last+gap) and merge only on overlap),
    so the oracle's boundary condition is ``>=`` — unlike the strict
    ``>`` of the batch `sessionize_events` query."""
    return run_sessionized(spark, sf_dir)


@query(
    "streaming_stateful_user_stats",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       MAX(ts) AS last_ts
FROM events
WHERE ts IS NOT NULL  -- the stateful job keys time-ordered state on event time
GROUP BY user_id
ORDER BY user_id
""",
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent running aggregates (count/max/min/latest) kept
    in the state store across micro-batches — deterministic under any
    batch split, hence exactly oracle-checkable."""
    return run_stateful_user_stats(spark, sf_dir)


@query(
    "streaming_dedup",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props
FROM events
ORDER BY event_id
""",
    tags=("streaming", "dedup", "exactly-once", "bounded-state"),
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream unioned with itself (every row twice) must come out
    exactly once via ``dropDuplicatesWithinWatermark`` on event_id —
    the bounded-state form (key state expires past the 1h watermark
    horizon instead of growing one row per distinct key forever).
    Deterministic because every column is functionally determined by
    event_id and the AvailableNow drain delivers both union legs in
    one micro-batch (see run_stream_dedup)."""
    return run_stream_dedup(spark, sf_dir)


@query(
    "streaming_static_join",
    oracle="""
SELECT c.c_nationkey,
       COUNT(*) AS n_events,
       SUM(CAST(e.value AS DECIMAL(38,6))) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("streaming", "stream-static-join"),
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream joined to the static customer dimension (broadcast
    per micro-batch), aggregated per nation — the enrichment stage every
    streaming ingest DAG needs."""
    return run_stream_static_join(spark, sf_dir)


@query(
    "streaming_stream_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id AS p_user
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id
""",
    tags=("streaming", "stream-stream-join"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to the same user's clicks in the prior hour —
    two watermarked streams with an event-time-bounded condition (the
    requirement that lets join state expire), checked against the batch
    join answer."""
    return run_stream_stream_join(spark, sf_dir)
