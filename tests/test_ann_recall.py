"""Recall@5 measurement for the ANN indexes (VERDICT r5 item 5).

The measured values at sf0.01 are fully deterministic (no RNG anywhere
in the indexes or the harness), but the testdata corpus is regenerated
by the driver, so the pins are structural invariants plus modest
floors rather than exact equalities:

- searching ALL k-means lists (nprobe = k) IS brute force, so recall
  must be exactly 1.0 — the harness's own correctness anchor;
- recall is monotonically non-decreasing in nprobe (a superset of
  candidates can only add true neighbors);
- trained k-means at nprobe=1 must beat the label stand-in bucketing
  (the whole point of training real centroids).

The full measured table lives in SCALE.md ("ANN recall@5").
"""

from __future__ import annotations

import pytest

from makerdao_dw_spark.operators.ann_eval import recall_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    return recall_table(spark, SF, kmeans_nprobes=(1, 2, 8), srp_hamming=(0, 1))


@pytest.fixture(scope="module")
def table(rows):
    return {(r["strategy"], r["nprobe"]): r["recall"] for r in rows}


def test_full_probe_kmeans_is_exact(table):
    # nprobe = k searches every inverted list == brute force
    assert table[("ivf_kmeans", 8)] == 1.0


def test_recall_monotone_in_nprobe(table):
    assert (
        table[("ivf_kmeans", 1)]
        <= table[("ivf_kmeans", 2)]
        <= table[("ivf_kmeans", 8)]
    )
    assert table[("srp_lsh", 1)] <= table[("srp_lsh", 9)]


def test_trained_centroids_beat_label_standin(table):
    assert table[("ivf_kmeans", 1)] > table[("ivf_label", 1)]


def test_recall_floors(table):
    """Modest floors under the round-6 measured values (kmeans@1 0.37,
    kmeans@2 0.52, srp@9 0.16 at sf0.01) — loose enough to survive a
    corpus regeneration, tight enough to catch an index regression
    (e.g. a broken bucket assignment reads ~0)."""
    assert table[("ivf_kmeans", 1)] >= 0.15
    assert table[("ivf_kmeans", 2)] >= 0.25
    assert table[("srp_lsh", 9)] >= 0.05


def test_enough_probes_for_floors(rows):
    """The floors above are only meaningful over a real probe set: a
    corpus regeneration that shrinks the embeddings table (or a
    probe_mod change) could leave 1-2 probes, making recall a coin
    flip that still clears the floors. 20 probes at round-6 sf0.01."""
    assert all(r["n_probes"] >= 10 for r in rows), rows


def test_pq_adc_shortlist_recall(spark):
    """ann_pq_adc: the exact-rescored top-3 must recover most of the
    true L2 top-3 (shortlist recall — measured 0.73 at round-6 sf0.01
    with the 50-wide ADC shortlist; floor 0.55 to survive corpus
    regeneration). Also pins that the 'exact' rescore really is exact:
    every emitted exact_dist matches an independent NumPy computation."""
    import duckdb
    import numpy as np

    from makerdao_dw_spark.queries import REGISTRY

    rows = REGISTRY["ann_pq_adc"].fn(spark, SF).collect()
    assert rows, "no PQ results"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)

    con = duckdb.connect()
    d = con.execute(
        # mirror the query's NULL filter: a regenerated corpus with a
        # NULL embedding must not crash the ground-truth load (or skew
        # it with vectors the query excludes)
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        f"WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in d])
    x = np.array([r[1] for r in d], dtype=np.float64)

    hits = tot = 0
    for q, rs in by_q.items():
        qi = int(np.where(ids == q)[0][0])
        dist = ((x - x[qi]) ** 2).sum(axis=1)
        dist[qi] = np.inf
        exact3 = set(ids[np.lexsort((ids, dist))[:3]].tolist())
        hits += len(exact3 & {r["neighbor_id"] for r in rs})
        tot += 3
        for r in rs:  # the rescore is a true L2^2, not another estimate
            ci = int(np.where(ids == r["neighbor_id"])[0][0])
            assert abs(r["exact_dist"] - dist[ci]) < 1e-6, r
    assert len(by_q) >= 5, "probe set too small for a meaningful floor"
    assert hits / tot >= 0.55, f"PQ shortlist recall@3 = {hits}/{tot}"


def test_banded_srp_dedup_dominates_single_cell(spark):
    """dedup_embedding_cosine_banded (b=4 OR-ed bands of r=8 planes) vs
    the single-cell variant. Band 0 reuses the single-cell's planes, so
    the banded candidate set is a SUPERSET by construction — asserted
    structurally (coverage superset + per-vector cosine dominance) and
    as a measured recall floor against exact within-label top-1 (label
    is the coarse partitioner in BOTH variants, so cross-label misses
    are the label-block contract, not SRP's).

    Context for the absolute numbers: this corpus is near-isotropic
    (true-NN cosines ~0.3-0.5, where a single 8-plane cell match is
    ~2-5% likely); banding measured 0.02 -> 0.06 strict top-1 and
    113 -> 311 of 500 vectors covered at round-9 sf0.01. On a corpus
    with real near-dups (cosine >= 0.9) the banded match rate is
    1-(1-p^8)^4 ~= 75% vs ~29% single-cell."""
    import duckdb
    import numpy as np

    from makerdao_dw_spark.queries import REGISTRY

    d = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL"
    ).fetchall()
    ids = np.array([r[0] for r in d])
    lab = np.array([r[1] for r in d])
    x = np.array([r[2] for r in d], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1)
    keep = nrm > 0
    ids, lab, xn = ids[keep], lab[keep], x[keep] / nrm[keep][:, None]

    truth = {}
    for li in np.unique(lab):
        m = lab == li
        gid, v = ids[m], xn[m]
        if len(gid) < 2:
            continue
        s = v @ v.T
        np.fill_diagonal(s, -9)
        for i, qid in enumerate(gid):
            c = np.round(s[i], 6)  # query tie-break: cosine desc, id asc
            truth[qid] = gid[np.lexsort((gid, -c))[0]]
    assert len(truth) >= 100, "corpus too small for a meaningful floor"

    single = {
        r["vec_id"]: r
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF).collect()
    }
    banded = {
        r["vec_id"]: r
        for r in REGISTRY["dedup_embedding_cosine_banded"].fn(spark, SF).collect()
    }
    # structural superset: every vector the single cell reaches, a band reaches
    assert set(single) <= set(banded)
    # per-vector dominance: the banded candidate pool contains the
    # single cell's, so its best same-cell cosine can only be >=
    for vid, r in single.items():
        assert banded[vid]["nn_cosine"] >= r["nn_cosine"], vid
    rec = {
        name: sum(1 for q, t in truth.items() if res.get(q) and res[q]["nn_id"] == t)
        / len(truth)
        for name, res in (("single", single), ("banded", banded))
    }
    assert rec["banded"] >= rec["single"]
    assert rec["banded"] >= 0.03, rec  # measured 0.06 round 9; margin for regen
    assert len(banded) >= len(single) >= 50
