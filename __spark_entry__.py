"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared operator surface from
makerdao_dw_spark.queries (SURVEY.md §2 inventory + §7 extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from makerdao_dw_spark.queries import oracles_dict, queries_dict  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the normalized surface (queries_dict wrapper), so entry() emits
    exactly what queries()['flagship_events_funnel'] emits — canon-stable
    doubles/strings, no decimals or dates."""
    return queries_dict()["flagship_events_funnel"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    return oracles_dict()
