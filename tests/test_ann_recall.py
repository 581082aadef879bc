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
