"""Driver-t2-style gate run locally: every registered query with an oracle
must match DuckDB exactly at sf0.001 (fast) — this is the same comparison
the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from makerdao_dw_spark.queries import REGISTRY

from .conftest import SF_DIR, compare_with_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    compare_with_oracle(spark, name, q.fn, q.oracle, SF_DIR)


def test_registry_nonempty():
    assert len(REGISTRY) >= 1
