"""ANN-shortlist KNN (VERDICT r7 item 3): the IVF-shortlisted scoring
path must be (a) exactly the brute-force pipeline when it searches all
inverted lists, (b) a strict candidate subset when it doesn't, and
(c) above a measured recall floor at the default nprobe — the same
pin structure as tests/test_ann_recall.py.

Measured at round-8 sf0.01: recall@5 = 0.53 (sf0.1: 0.445), coverage
1.0. Floors sit well under those so a driver corpus regeneration
doesn't flake them, but a broken cluster routing (recall ~nprobe/k
of random = ~0.25 * random) still fails.
"""

from __future__ import annotations

from collections import defaultdict

from makerdao_dw_spark.queries.training6 import (
    _KM_K,
    _knn_scored_ann,
    _knn_scored_exact,
    _knn_topk,
    knn_predictions,
    knn_predictions_ann,
)

SF = "/root/testdata/sf0.01"


def _top5_sets(topk_rows):
    out = defaultdict(set)
    for r in topk_rows:
        out[r.query_id].add(r.neighbor_id)
    return out


def test_full_probe_ann_equals_exact(spark):
    """nprobe = k searches every inverted list == brute force: the ANN
    pipeline must reproduce the exact predictions row for row — the
    harness's own correctness anchor."""
    exact = sorted(map(tuple, knn_predictions(spark, SF).collect()))
    full = sorted(
        map(tuple, knn_predictions_ann(spark, SF, nprobe=_KM_K).collect())
    )
    assert exact == full


def test_shortlist_is_strict_candidate_subset(spark):
    """Default-nprobe candidates must be a subset of the exact
    candidate pairs (the shortlist never invents a neighbor) and a
    STRICT subset (it actually prunes — a routing bug that matches
    every cluster would pass the subset check alone)."""
    exact_pairs = {
        (r.query_id, r.neighbor_id)
        for r in _knn_scored_exact(spark, SF).select(
            "query_id", "neighbor_id"
        ).collect()
    }
    ann_pairs = {
        (r.query_id, r.neighbor_id)
        for r in _knn_scored_ann(spark, SF).select(
            "query_id", "neighbor_id"
        ).collect()
    }
    assert ann_pairs <= exact_pairs
    assert len(ann_pairs) < len(exact_pairs)


def test_recall_and_coverage_floors(spark):
    ex = _top5_sets(_knn_topk(_knn_scored_exact(spark, SF)).collect())
    an = _top5_sets(_knn_topk(_knn_scored_ann(spark, SF)).collect())
    assert len(ex) >= 10, "probe panel too small for a meaningful floor"
    coverage = sum(1 for q in ex if q in an) / len(ex)
    assert coverage >= 0.9, coverage
    recall = sum(len(ex[q] & an.get(q, set())) / len(ex[q]) for q in ex) / len(ex)
    assert recall >= 0.25, recall


def test_recall_monotone_in_nprobe(spark):
    """More inverted lists can only add true neighbors."""
    ex = _top5_sets(_knn_topk(_knn_scored_exact(spark, SF)).collect())

    def recall(nprobe: int) -> float:
        an = _top5_sets(
            _knn_topk(_knn_scored_ann(spark, SF, nprobe=nprobe)).collect()
        )
        return sum(
            len(ex[q] & an.get(q, set())) / len(ex[q]) for q in ex
        ) / len(ex)

    r1, r2, rk = recall(1), recall(2), recall(_KM_K)
    assert r1 <= r2 <= rk
    assert rk == 1.0
