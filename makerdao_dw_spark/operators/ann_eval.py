"""Recall measurement for the approximate-nearest-neighbor indexes.

Recall@k is THE quality axis of an ANN deployment: every index in
`queries/similarity.py` trades candidate-set size against it, and at
100 TB the knob a user actually turns is `nprobe` (how many inverted
lists / LSH buckets a probe searches), not the index structure. This
module measures that trade distributively:

- ground truth = exact cosine top-k over the full corpus (the same
  brute-force formulation as `ann_bruteforce_topk`, broadcast probes);
- an index strategy maps every vector to ONE bucket (its inverted-list
  assignment) and every probe to `nprobe` buckets (the lists it
  searches); candidates are corpus vectors in any probed bucket;
- recall@k = |approx top-k ∩ true top-k| / |true top-k| averaged over
  probes (the denominator is the TRUE set size, deliberately: a probe
  with fewer than k neighbors in the corpus — small or heavily
  filtered slices — can still score 1.0 by finding all of them,
  instead of being capped at |true|/k by an unreachable k).

Everything is a DataFrame pipeline — the only driver-side data are the
per-probe top-k id sets (Q*k rows) and the k*dim centroid list. The
candidate generation is the SAME join shape the production queries use
(equi-join on the bucket key), so measured recall describes exactly
what the registered queries retrieve.

Strategies (all deterministic — every recall number is reproducible
bit-for-bit, so tests pin exact floors):
- `label`: the dataset's label column as the coarse partition
  (ann_ivf_bucketed); nprobe fixed at 1 (labels are not metric — there
  is no "second-nearest label").
- `kmeans`: trained centroids (operators/kmeans.py, the
  ann_ivf_kmeans index); a probe searches its nprobe nearest
  centroids' lists — the standard IVF search knob.
- `srp`: signed-random-projection hyperplane hashing
  (ann_srp_lsh); a probe at nprobe=1 searches its own bucket, at
  nprobe=9 all buckets within Hamming distance 1 (flip each of the 8
  plane bits) — the LSH multi-probe analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _topk_sets(scored: DataFrame, k: int) -> dict[int, frozenset[int]]:
    """Collect per-query top-k neighbor-id sets from (query_id,
    neighbor_id, cos) rows. Ties broken by neighbor_id — the same
    contract as ann_bruteforce_topk."""
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    rows = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id")
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return {q: frozenset(s) for q, s in out.items()}


def _cos_select(joined: DataFrame) -> DataFrame:
    """THE cosine-scoring projection, shared by the exact ground-truth
    path and every bucketed approximate path — one formulation, so the
    two sides of the recall comparison can never drift."""
    from ..queries.similarity import _dot_expr

    return joined.select(
        "query_id",
        "neighbor_id",
        (F.expr(_dot_expr("qv", "cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )


def _scored(probes: DataFrame, cands: DataFrame) -> DataFrame:
    """Exact cosine of every (probe, candidate) pair; probes broadcast
    (Q rows — tiny next to the corpus)."""
    return _cos_select(
        F.broadcast(probes).join(cands, F.col("query_id") != F.col("neighbor_id"))
    )


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.similarity import _dot_expr
    from ..session import load_table

    e = load_table(spark, sf_dir, "embeddings", spread=True)
    return e.withColumn(
        "nrm", F.expr(f"sqrt({_dot_expr('embedding', 'embedding')})")
    ).filter(F.col("nrm") > 0)


def true_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_mod: int = 25,
    k: int = 5,
    nz: DataFrame | None = None,
) -> dict[int, frozenset[int]]:
    """Exact brute-force ground truth: per-probe top-k over the FULL
    corpus (probes = vec_id % probe_mod == 0, zero-norm excluded).
    Pass `nz` to reuse an already-built corpus frame (recall_table
    does — ONE corpus definition for truth and approx paths)."""
    if nz is None:
        nz = _corpus(spark, sf_dir)
    probes = nz.filter(F.col("vec_id") % probe_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cands = nz.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    return _topk_sets(_scored(probes, cands), k)


def _bucketed_topk(
    nz: DataFrame,
    bucket_col,
    probe_buckets_col,
    probe_mod: int,
    k: int,
) -> dict[int, frozenset[int]]:
    """Top-k restricted to candidates whose bucket is in the probe's
    searched-bucket array: explode the (small) per-probe bucket list,
    equi-join on the bucket key — the same shuffle shape the production
    same-bucket joins use, never a theta join."""
    base = nz.withColumn("bkt", bucket_col)
    probes = (
        base.filter(F.col("vec_id") % probe_mod == 0)
        .withColumn("pb", probe_buckets_col)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
            F.explode("pb").alias("bkt"),
        )
    )
    cands = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
        "bkt",
    )
    scored = _cos_select(
        F.broadcast(probes).join(
            cands,
            (probes["bkt"] == cands["bkt"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
    )
    # a probe searching multiple buckets can see a candidate once per
    # shared bucket — dedup before ranking
    scored = scored.groupBy("query_id", "neighbor_id").agg(F.max("cos").alias("cos"))
    return _topk_sets(scored, k)


def recall_at_k(
    approx: dict[int, frozenset[int]], truth: dict[int, frozenset[int]]
) -> float:
    """Mean over probes of |approx ∩ true| / |true|. Probes with no
    approx candidates at all contribute 0 (an index that returns
    nothing is not excused from the average)."""
    if not truth:
        return 1.0
    return sum(
        len(approx.get(q, frozenset()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def recall_table(
    spark: SparkSession,
    sf_dir: str,
    probe_mod: int = 25,
    k: int = 5,
    kmeans_nprobes: tuple[int, ...] = (1, 2, 4),
    srp_hamming: tuple[int, ...] = (0, 1),
) -> list[dict]:
    """Measure recall@k of every index strategy at several search
    widths. Returns [{strategy, nprobe, recall, n_probes}, ...] —
    the numbers SCALE.md tables and tests pin."""
    from ..queries.similarity import _KM_ITER, _KM_K, _dot_expr, _srp_bucket_spark
    from .kmeans import kmeans_fit

    nz = _corpus(spark, sf_dir)
    truth = true_topk(spark, sf_dir, probe_mod, k, nz=nz)
    out: list[dict] = []

    # --- label buckets (nprobe is not meaningful: labels aren't metric)
    approx = _bucketed_topk(nz, F.col("label"), F.array(F.col("label")), probe_mod, k)
    out.append(
        {
            "strategy": "ivf_label",
            "nprobe": 1,
            "recall": round(recall_at_k(approx, truth), 4),
            "n_probes": len(truth),
        }
    )

    # --- trained k-means IVF with the standard nprobe knob
    centroids = kmeans_fit(
        nz.select("vec_id", "embedding"), "embedding", "vec_id", k=_KM_K, max_iter=_KM_ITER
    )
    from .kmeans import dists_arr

    dists = dists_arr("embedding", centroids)
    # nearest-centroid rank list: sort (dist, cluster_id) pairs — the
    # id tie-break keeps the ranking deterministic
    ranked = F.transform(
        F.array_sort(
            F.transform(
                dists, lambda d, i: F.struct(d.alias("d"), i.alias("c"))
            )
        ),
        lambda s: s["c"],
    )
    cluster = F.element_at(ranked, 1)
    for nprobe in kmeans_nprobes:
        approx = _bucketed_topk(
            nz, cluster, F.slice(ranked, 1, nprobe), probe_mod, k
        )
        out.append(
            {
                "strategy": "ivf_kmeans",
                "nprobe": nprobe,
                "recall": round(recall_at_k(approx, truth), 4),
                "n_probes": len(truth),
            }
        )

    # --- SRP hyperplane LSH with Hamming-radius multi-probe
    code = F.expr(_srp_bucket_spark("embedding")).cast("int")
    for radius in srp_hamming:
        # multi-probe = the full Hamming ball of the 8-plane code:
        # radius 0 -> 1 bucket, 1 -> 9, 2 -> 37 (1 + C(8,1) + C(8,2))
        import itertools

        masks = [0] + [
            sum(1 << i for i in combo)
            for r in range(1, radius + 1)
            for combo in itertools.combinations(range(8), r)
        ]
        pb = F.array(*[code.bitwiseXOR(F.lit(m)) for m in masks])
        nprobe = len(masks)
        approx = _bucketed_topk(nz, code, pb, probe_mod, k)
        out.append(
            {
                "strategy": "srp_lsh",
                "nprobe": nprobe,
                "recall": round(recall_at_k(approx, truth), 4),
                "n_probes": len(truth),
            }
        )
    return out
