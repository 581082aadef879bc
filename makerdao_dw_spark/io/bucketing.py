"""Bucketed tables: shuffle-free co-located joins.

The biggest repeated cost in a 100 TB warehouse is re-shuffling the same
fact tables on the same join key every query. Bucketing pays that
shuffle ONCE at write time: both sides stored pre-hash-partitioned (and
optionally sorted) on the key, so a join plans as a zero-exchange
sort-merge over aligned buckets. This is exactly how the
`<contract>_evt_*`/`transactions` tables should be laid out for the
block_number joins the reference's schema implies
(/root/reference/classes.py:95,136 common columns; README.md:43-48).

Spark-native bucketing (saveAsTable + bucketBy) is catalog-tracked;
`spark.sql.sources.bucketing.enabled` (default true) lets the planner
trust the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import ensure_database


def write_bucketed(
    df: DataFrame,
    database: str,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and bucket-sorted) catalog table.

    n_buckets must MATCH across tables that will join — aligned bucket
    counts are what let the planner drop both exchanges. Pick it from
    target file sizes (bucket ~ total/n_buckets ≈ 0.5-2 GB), not from
    cluster width.
    """
    spark = df.sparkSession
    ensure_database(spark, database)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(f"`{database}`.`{table}`")


def bucketed_join(
    spark: SparkSession, database: str, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(f"`{database}`.`{left}`").join(
        spark.table(f"`{database}`.`{right}`"), on, how
    )
