"""Streaming sources over the testdata layout.

A file-stream source needs a directory; we scope it to one table with
``pathGlobFilter``. Schema comes from a one-off batch read (a streaming
reader cannot infer), and the driver testdata's TIMESTAMP(NANOS) columns
get the same nanos->micros normalization as the batch path
(session.load_table).

At scale this is exactly the bronze-landing pattern: ingest jobs append
parquet files to a watched directory; the stream picks up new files per
micro-batch and the checkpoint (not a max-scan probe like the
reference's classes.py:32-50) records what has been processed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import _NANO_TS_COLUMNS, configure


def stream_table(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Open a testdata table as a file-stream (micro-batch) DataFrame."""
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # The file-stream source does NOT recurse into plain subdirectories:
    # a table shipped as ONE file (driver testdata) is globbed out of
    # sf_dir, but a table written as a part-file DIRECTORY (our scaled
    # corpora, any Spark-written table) must be watched directly with a
    # part-file glob or the stream silently drains 0 rows. Two verified
    # non-flat cases (tests/test_streaming.py): Hive-partitioned layouts
    # (key=value subdirs, the ingest sink's shape) ARE recursed by
    # Spark's partition discovery and keep the partition column; any
    # OTHER nesting fails loudly at the batch schema read above
    # (UNABLE_TO_INFER_SCHEMA) — never a silent 0-row drain.
    if os.path.isdir(path):
        reader = spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet")
    else:
        reader = spark.readStream.schema(schema).option(
            "pathGlobFilter", f"{name}.parquet"
        )
        path = sf_dir
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    for c in _NANO_TS_COLUMNS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def stream_dir(spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None) -> DataFrame:
    """Watch a landing directory of parquet files (bronze ingest pattern)."""
    configure(spark)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
