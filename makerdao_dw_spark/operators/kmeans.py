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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col: str, centroid: list[float]):
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add a `cluster` column (0-based nearest-centroid id, squared-L2,
    ties -> lowest id). Pure expression: no shuffle, no Python."""
    dists = F.array(*[_dist2(vec_col, c) for c in centroids])
    return df.withColumn(
        "cluster", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def kmeans_fit(
    df: DataFrame, vec_col: str, id_col: str, k: int, max_iter: int = 3
) -> list[list[float]]:
    """Train k centroids with Lloyd iterations. Init = the k vectors with
    the lowest `id_col` values (deterministic, no RNG). Returns centroids
    ordered by cluster id; empty clusters keep their previous centroid."""
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in init]
    if not centroids:
        raise ValueError(
            "kmeans_fit: input DataFrame is empty (e.g. every vector was "
            "filtered out as zero-norm) — cannot initialize centroids"
        )
    if len(centroids) < k:
        raise ValueError(
            f"kmeans_fit: input has only {len(centroids)} rows but k={k}; "
            "reduce k or supply more vectors"
        )
    dim = len(centroids[0])
    for _ in range(max_iter):
        assigned = assign_clusters(df, vec_col, centroids)
        # cast double BEFORE decimal (float->double is exact) and derive
        # the mean as ONE double division of the exact decimal sum — the
        # same two rules every oracle-matched vector aggregate follows
        # (embedding_centroids_long), so the training loop is replicable
        # bit-for-bit in DuckDB (ann_ivf_kmeans's unrolled oracle).
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        new = list(centroids)
        for r in means:
            vec = list(map(float, r["centroid"]))
            assert len(vec) == dim
            new[r["cluster"]] = vec
        centroids = new
    return centroids
