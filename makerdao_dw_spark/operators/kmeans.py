"""Distributed k-means (Lloyd) for IVF-style ANN partitioning.

The IVF scale path for similarity search is: train coarse centroids,
assign every vector to its nearest centroid (the inverted list), then
restrict search to the probe's list(s). `queries/similarity.py`'s
`ann_ivf_bucketed` uses the dataset's `label` as a stand-in assignment;
this operator trains REAL centroids, Spark-natively:

- assignment is a pure JVM expression: per-centroid squared-L2 built
  with `zip_with`/`aggregate` over broadcast literal centroids, argmin
  via `array_position(.., array_min(..))` (first index wins ties —
  deterministic);
- the update step computes per-dimension means by `posexplode` +
  DECIMAL(38,12) sums, so the reduction is order-independent — the same
  determinism rule the oracle queries follow — then reassembles vectors
  with `sort_array(collect_list(struct(pos, mean)))`;
- the driver only ever holds k x dim floats (the centroids), never data.

At 100 TB this is the textbook layout: one narrow shuffle per iteration
(k x dim groups), assignment fully map-side, and the resulting
(centroid_id -> vectors) partitioning IS the inverted file. A fixed
iteration count keeps runs reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vals) -> Column:
    """One centroid as a SINGLE array<double> Literal node.

    `F.lit(list)` expands to CreateArray with one Literal PER element,
    so a k x dim codebook became k*dim expression nodes per use — at
    (k=16, dim=16) x 4 subspaces x (train iterations + encode + ADC
    tables) the driver spent ~13 s per ann_pq_adc run ANALYZING
    literal trees (NOTES round-6 measurement; optimization guide §1:
    driver-side planning is single-threaded work). A numpy array
    literal is one node carrying the whole vector (r11)."""
    return F.lit(np.asarray([float(x) for x in vals], dtype="float64"))


def _dlit(x: float) -> str:
    """One double as a SQL literal that parses back to the same bits:
    repr() is the shortest round-tripping decimal (Python >= 3.1) and
    Spark's parser is correctly-rounding, so value-identity holds.
    NaN/Infinity have no literal syntax and go through CAST."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def codebook_lit(centroids: list[list[float]]) -> Column:
    """A whole codebook as array<array<double>>, parsed from ONE SQL
    expression string. Element index == cluster id.

    The previous form (F.array of k numpy-vector F.lit calls) cost one
    py4j round trip per centroid — ~75 ms per (k=16) codebook, and the
    kmeans/PQ family rebuilds its codebook columns with fresh values
    every Lloyd iteration, so literal CONSTRUCTION (driver-side, before
    any Spark work) dominated a warm iteration (~1.5 s of the measured
    ~2 s, r11). One expression-string parse is ~1 ms and yields the
    same nested Literal after constant folding."""
    return F.expr(
        "array(" + ",".join("array(" + ",".join(_dlit(x) for x in c) + ")" for c in centroids) + ")"
    )


def _sq_l2(vec: Column, cent: Column) -> Column:
    """Squared L2 as the house fixed-order left fold — bit-identical to
    the per-centroid expression the unrolled DuckDB oracles mirror."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dist2(vec_col: str, centroid: list[float]):
    return _sq_l2(F.col(vec_col), _lit_vec(centroid))


def dists_arr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Array of squared-L2 distances to every centroid (index = cluster
    id): ONE transform lambda over the codebook literal instead of k
    unrolled fold subtrees — same math per element, in element order,
    so results are bit-identical; the expression tree shrinks from
    O(k*dim) to O(k + dim-free lambda) nodes (r11)."""
    return F.transform(codebook_lit(centroids), lambda c: _sq_l2(F.col(vec_col), c))


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add a `cluster` column (0-based nearest-centroid id, squared-L2,
    ties -> lowest id). Pure expression: no shuffle, no Python.

    The distance array is computed into a scratch COLUMN first so the
    argmin references an attribute, not two inlined copies of the
    k-centroid transform expression — `array_position(d, array_min(d))`
    with `d` inlined doubled every consumer's analyzed tree (r11; the
    values are identical either way). The scratch name is suffixed
    until absent from df (ADVICE r11: a caller column with the fixed
    name would have been silently clobbered then dropped)."""
    dcol = f"__kmeans_dists_{vec_col}"
    while dcol in df.columns:
        dcol += "_"
    return (
        df.withColumn(dcol, dists_arr(vec_col, centroids))
        .withColumn(
            "cluster",
            (F.array_position(F.col(dcol), F.array_min(F.col(dcol))) - 1).cast("int"),
        )
        .drop(dcol)
    )


def kmeans_fit(
    df: DataFrame, vec_col: str, id_col: str, k: int, max_iter: int = 3
) -> list[list[float]]:
    """Train k centroids with Lloyd iterations. Init = the k vectors with
    the lowest `id_col` values (deterministic, no RNG). Returns centroids
    ordered by cluster id; empty clusters keep their previous centroid."""
    return kmeans_fit_multi(df, [vec_col], id_col, k, max_iter)[0]


def kmeans_fit_multi(
    df: DataFrame,
    vec_cols: list[str],
    id_col: str,
    k: int,
    max_iter: int = 3,
) -> list[list[list[float]]]:
    """Train one k-centroid codebook PER vector column in SHARED
    distributed passes — the PQ-subspace shape (m codebooks over m
    slices of one checkpointed table). Per-codebook math is identical
    to independent kmeans_fit calls (assignment expressions and the
    per-(codebook, cluster, pos) decimal mean sums don't interact), so
    any unrolled oracle of the single-column form stays valid; the win
    is driver round-trips: 1 init collect + 1 mean collect per
    iteration TOTAL instead of per codebook (ann_pq_adc: ~13 jobs ->
    ~4, measured 18.6s -> see commit)."""
    init_rows = df.orderBy(id_col).limit(k).select(*vec_cols).collect()
    if not init_rows:
        raise ValueError(
            "kmeans_fit: input DataFrame is empty (e.g. every vector was "
            "filtered out as zero-norm) — cannot initialize centroids"
        )
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_fit: input has only {len(init_rows)} rows but k={k}; "
            "reduce k or supply more vectors"
        )
    cents = [
        [list(map(float, r[i])) for r in init_rows]
        for i in range(len(vec_cols))
    ]
    dims = [len(c[0]) for c in cents]
    for _ in range(max_iter):
        # cast double BEFORE decimal (float->double is exact) and derive
        # the mean as ONE double division of the exact decimal sum — the
        # same two rules every oracle-matched vector aggregate follows
        # (embedding_centroids_long), so the training loop is replicable
        # bit-for-bit in DuckDB (ann_ivf_kmeans's unrolled oracle).
        #
        # Each union branch carries ONLY its own subspace's assignment
        # expression (select straight off df), not a chain of all m
        # assignments per branch — the chained form put m copies of
        # every codebook's distance transform into each branch and made
        # Catalyst analysis the dominant cost of an iteration on cached
        # data (r11; identical rows either way — the branches never read
        # another subspace's columns).
        longf = None
        for i, vc in enumerate(vec_cols):
            part = df.select(
                F.col(vc).alias("__v"),
                dists_arr(vc, cents[i]).alias("__d"),
            ).select(
                F.lit(i).alias("sub"),
                (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1)
                .cast("int")
                .alias("cluster"),
                F.posexplode("__v").alias("pos", "v"),
            )
            longf = part if longf is None else longf.unionByName(part)
        means = (
            longf.groupBy("sub", "cluster", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("sub", "cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in means:
            vec = list(map(float, r["centroid"]))
            assert len(vec) == dims[r["sub"]]
            new[r["sub"]][r["cluster"]] = vec
        cents = new
    return cents
