"""Driver-t2-style gate run locally: every registered query with an oracle
must match DuckDB exactly at sf0.001 (fast) — this is the same comparison
the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from makerdao_dw_spark.queries import REGISTRY, oracles_dict, queries_dict

from .conftest import SF_DIR, compare_with_oracle

# Test the NORMALIZED surface (double-cast wrappers applied) — this is
# exactly what the driver consumes via __spark_entry__.queries()/oracle_sql().
QUERIES = queries_dict()
ORACLES = oracles_dict()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], SF_DIR)


def test_registry_nonempty():
    assert len(REGISTRY) >= 1
