"""Regression tests for the round-4 review findings: cross-engine
landmines that were inert on the shipped testdata (no 6-decimal values,
no NULL charge columns, no customer exactly at the average balance) but
would have failed the driver gate on the data shapes below. Each test
builds the triggering corpus and runs the full Spark-vs-DuckDB compare.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from makerdao_dw_spark.queries import REGISTRY, oracles_dict, queries_dict

from .conftest import compare_with_oracle

QUERIES = queries_dict()
ORACLES = oracles_dict()


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(str(tmp_path), f"{name}.parquet"))


def test_stats_moments_exact_at_six_decimals(spark, tmp_path):
    """Squaring at DECIMAL(38,6) would round each product to 6dp in
    Spark (precision-cap overflow) while DuckDB keeps the wider exact
    product — values with >3 decimal places used to drift. The (18,6)
    formulation must match exactly."""
    vals = [i / 999983.0 for i in range(1, 4000)]  # full 6+dp mantissas
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_type": [("click", "view", "buy")[i % 3] for i in range(len(vals))],
                "value": vals,
            }
        ),
    )
    compare_with_oracle(
        spark, "stats_moments", QUERIES["stats_moments"], ORACLES["stats_moments"], str(tmp_path)
    )


def test_unpivot_matches_duckdb_on_null_charges(spark, tmp_path):
    """DuckDB UNPIVOT silently drops NULL cells; Spark stack() keeps
    them. With NULL l_tax/l_discount rows present both engines must
    agree (the Spark side now filters NULL amounts explicitly)."""
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": [100, 200, 300, 400],
                "l_linenumber": [1, 1, 2, 1],
                "l_extendedprice": [10.0, 20.0, None, 40.0],
                "l_discount": [0.1, None, 0.3, 0.0],
                "l_tax": [None, 0.02, 0.03, 0.04],
            }
        ),
    )
    name = "unpivot_lineitem_charges"
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))


def test_q22_boundary_customer_consistent(spark, tmp_path):
    """A customer whose balance EQUALS the positive-balance average must
    be excluded by both engines. The old avg-based predicate compared
    Spark DECIMAL(38,10) against DuckDB DOUBLE — an ulp could flip the
    boundary row; the multiplied-through exact form cannot."""
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_nationkey": [0, 0, 1, 1],
                # positive avg = (100.01+100.03+100.02)/3 = 100.02 exactly
                "c_acctbal": [100.01, 100.03, 100.02, -5.0],
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
            }
        ),
    )
    name = "q22_dormant_rich_customers"
    sdf = QUERIES[name](spark, str(tmp_path))
    rows = sdf.collect()
    # only customer 2 (100.03) is strictly above the 100.02 average
    assert [(r[0], r[1]) for r in rows] == [(0, 1)], rows
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))
