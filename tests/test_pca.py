"""operators/pca.py unit gates: the power method must recover a known
dominant direction, keep its direction on a constant corpus (zero
growth vector), and signal empty input — plus the determinism contract
(two fits on differently-partitioned input are bit-identical, the
property that lets the DuckDB oracle unroll the loop)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from makerdao_dw_spark.operators.pca import power_iteration_pc1

DIM = 4


def _mk(spark, rows, parts=4):
    df = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in enumerate(rows)],
        "vec_id bigint, embedding array<double>",
    )
    return df.repartition(parts)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_recovers_dominant_direction(spark):
    # variance 100x larger along e0 than elsewhere: PC1 must align
    # with e0 (up to sign) after 2 iterations.
    rows = []
    for i in range(40):
        big = 10.0 if i % 2 == 0 else -10.0
        small = 0.1 if i % 3 == 0 else -0.1
        rows.append([big, small, -small, small])
    mu, v = power_iteration_pc1(_mk(spark, rows), "embedding", DIM, n_iter=2)
    assert abs(_cos(v, [1.0, 0.0, 0.0, 0.0])) > 0.99
    assert abs(mu[0]) < 1e-9  # balanced +/- big values center to ~0


def test_constant_corpus_keeps_initial_direction(spark):
    rows = [[3.0, 1.0, 2.0, 0.5]] * 7
    mu, v = power_iteration_pc1(_mk(spark, rows), "embedding", DIM, n_iter=2)
    assert mu == [3.0, 1.0, 2.0, 0.5]
    # growth vector vanished -> v stays the normalized all-ones init
    assert v == [0.5, 0.5, 0.5, 0.5]


def test_empty_input_returns_none(spark):
    df = _mk(spark, []).filter(F.col("vec_id") > 0)
    assert power_iteration_pc1(df, "embedding", DIM, n_iter=2) is None


def test_fit_is_partitioning_invariant(spark):
    """The oracle-unroll prerequisite: decimal per-dim sums + left-fold
    dots mean the fitted (mu, v) are BIT-identical regardless of how
    the input is partitioned/ordered."""
    rows = [
        [math.sin(i * 1.7) * (i % 5 + 1), math.cos(i * 0.3), i * 0.01, -i * 0.02]
        for i in range(60)
    ]
    fit1 = power_iteration_pc1(_mk(spark, rows, parts=1), "embedding", DIM, 2)
    fit2 = power_iteration_pc1(
        _mk(spark, list(reversed(rows)), parts=13), "embedding", DIM, 2
    )
    assert fit1 == fit2


def test_matches_numpy_power_iteration(spark):
    """Independent-implementation check (the kmeans precedent): the
    same algorithm in NumPy — mean-center, two power steps from the
    normalized all-ones vector — must agree to float tolerance (NumPy
    sums in a different order, so not bit-exact; 1e-9 relative is far
    below any real divergence and far above double noise here)."""
    np = pytest.importorskip("numpy")
    rng_rows = [
        [math.sin(i * 0.91) * 3, math.cos(i * 1.3), math.sin(i * 2.7) * 0.4, i % 7 * 0.1]
        for i in range(50)
    ]
    mu, v = power_iteration_pc1(_mk(spark, rng_rows, parts=5), "embedding", DIM, 2)
    x = np.array(rng_rows)
    nmu = x.mean(axis=0)
    nv = np.ones(DIM) / math.sqrt(DIM)
    c = x - nmu
    for _ in range(2):
        w = c.T @ (c @ nv)
        nv = w / np.linalg.norm(w)
    assert np.allclose(mu, nmu, rtol=0, atol=1e-9)
    assert np.allclose(v, nv, rtol=0, atol=1e-9)
