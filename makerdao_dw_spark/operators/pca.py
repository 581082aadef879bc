"""Distributed top-principal-component extraction via power iteration.

PCA is the embedding-space diagnostic a training-data pipeline runs
right after covariance (queries/similarity.py's embedding_covariance_
pairs): the dominant direction of the corpus, the per-cluster spread
along it, and the first step of any spectral whitening. A 100 TB corpus
cannot ship its vectors to a solver, but the power method only ever
needs mat-vec products against the centered data — each iteration is
ONE distributed pass:

    t_i = (x_i - mu) . v          (per-row fixed-order left fold, JVM)
    w_d = sum_i t_i * (x_i - mu)_d (per-dimension exact decimal sums)
    v'  = w / ||w||                (O(dim) driver-side normalization)

The driver only ever holds O(dim) doubles (mu, w, v) — never data —
exactly the contract of operators/kmeans.py. Determinism contract
(same as kmeans, so the loop unrolls into DuckDB CTEs for a full value
oracle in queries/training10.py):

- per-dimension reductions are DECIMAL(38,12) sums of doubles (exact,
  order-free under any partitioning) with ONE double division;
- every per-row dot product is a fixed-index-order left fold
  (((0 + t1) + t2) + ...), bit-identical to DuckDB's
  list_reduce(list_prepend(0.0, ...));
- v0 is the normalized all-ones vector (no RNG), iteration count is
  fixed, and a zero growth vector (constant corpus) keeps the previous
  direction — the analogue of kmeans' empty-cluster rule;
- the driver-side norm is the SAME left fold, evaluated in Python
  (IEEE doubles: ((0 + w1^2) + w2^2) + ... then one sqrt), so both
  engines see bit-identical centroids/directions.

Sign note: the power method's sign ambiguity is resolved by
determinism, not convention — both engines start from the same v0 and
perform identical arithmetic, so they converge to the same signed
vector.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_arr(vals: list[float]) -> Column:
    # single array<double> Literal node (a per-element F.lit expansion
    # costs dim nodes per use in driver analysis — see kmeans._lit_vec)
    return F.lit(np.asarray([float(x) for x in vals], dtype="float64"))


def centered_arr(vec_col: str, mu: list[float]) -> Column:
    """(x - mu) as a double array — pure JVM expression."""
    return F.zip_with(F.col(vec_col), _lit_arr(mu), lambda x, m: x.cast("double") - m)


def projection_of(centered: Column, v: list[float]) -> Column:
    """centered . v as a fixed-order left fold. Takes the prebuilt
    centered array so a caller that also consumes (x - mu) elementwise
    (the growth pass) evaluates the centering ONCE — Spark does not CSE
    across separate lambda-bearing higher-order expressions."""
    return F.aggregate(
        F.zip_with(centered, _lit_arr(v), lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )


def centered_projection(vec_col: str, mu: list[float], v: list[float]) -> Column:
    """(x - mu) . v — pure JVM expression, no shuffle, no Python."""
    return projection_of(centered_arr(vec_col, mu), v)


def _as_dense(rows, dim: int, field: str) -> list[float]:
    """Scatter collected (pos, value) rows into a dim-length list,
    validating that the data actually has `dim` dimensions: longer
    vectors would IndexError opaquely on the driver, shorter/ragged
    ones would silently diverge from the fixed-width oracle — both
    become a clear error here instead."""
    positions = {r["pos"] for r in rows}
    if positions != set(range(dim)):
        raise ValueError(
            f"pca: vector column does not have the declared dim={dim} "
            f"(observed positions 0..{max(positions)}, {len(positions)} "
            f"distinct{' — ragged or truncated input' if len(positions) < dim else ''})"
        )
    out = [0.0] * dim
    for r in rows:
        out[r["pos"]] = float(r[field])
    return out


def _per_dim_decimal_sums(df: DataFrame, arr: Column, dim: int) -> list[float] | None:
    """Exact per-dimension sums of a double-array column: posexplode ->
    DECIMAL(38,12) sum per position (one narrow shuffle of dim groups).
    Returns None on empty input."""
    rows = (
        df.select(F.posexplode(arr).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.col("x").cast("decimal(38,12)")).cast("double").alias("s"))
        .collect()
    )
    if not rows:
        return None
    return _as_dense(rows, dim, "s")


def power_iteration_pc1(
    df: DataFrame, vec_col: str, dim: int, n_iter: int = 2
) -> tuple[list[float], list[float]] | None:
    """Fit (mu, v) where v approximates the top principal component
    after `n_iter` power iterations. Returns None on empty input.
    Rows with a NULL vector must be filtered by the caller (the oracle
    excludes them too, so both engines train on identical input)."""
    n_mu = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    if not n_mu:
        return None
    mu = _as_dense(n_mu, dim, "m")

    v = [1.0 / math.sqrt(float(dim))] * dim
    for _ in range(n_iter):
        centered = centered_arr(vec_col, mu)
        t = projection_of(centered, v)
        w = _per_dim_decimal_sums(
            df.withColumn("t", t),
            F.transform(centered, lambda x: x * F.col("t")),
            dim,
        )
        if w is None:  # pragma: no cover - mu non-empty implies rows exist
            return None
        # driver-side norm: the SAME left fold as the oracle's
        # list_reduce(list_prepend(0.0, [w1^2, ...])) — IEEE doubles in
        # index order, then one sqrt / one division per element.
        acc = 0.0
        for x in w:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        if nrm == 0.0:
            # constant corpus: growth vector vanished; keep direction
            # (kmeans' empty-cluster rule). Further iterations are
            # no-ops by the same argument.
            break
        v = [x / nrm for x in w]
    return mu, v
