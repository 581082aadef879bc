"""BPE trainer: the greedy merge fold vs a pure-Python reference, plus
cross-engine agreement of the full unrolled pipeline at sf0.001."""

from __future__ import annotations

import pytest

from makerdao_dw_spark.queries.bpe import (
    _BPE_STEPS,
    _MERGE_DUCK,
    _MERGE_SPARK,
    _duck_train_ctes,
)


# --- pure-Python reference: one greedy left-to-right BPE merge pass --------
def ref_merge(sym: str, p1: str, p2: str) -> str:
    s = sym.split(" ")
    out: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return " ".join(out)


CASES = [
    # (symbols, p1, p2) — chains, overlaps, merged-symbol-reuse
    ("l o w e r", "l", "o"),
    ("a a a", "a", "a"),
    ("a a a a", "a", "a"),
    ("a a a a a", "a", "a"),
    ("ab b b", "ab", "b"),
    ("a ab ab", "a", "ab"),
    ("b a b a b", "a", "b"),
    ("x y", "y", "x"),
    ("z", "z", "z"),
    ("aa a aa", "aa", "a"),
]


def test_merge_fold_matches_reference_spark(spark):
    rows = [(sym, p1, p2) for sym, p1, p2 in CASES]
    df = spark.createDataFrame(rows, ["sym", "_p1", "_p2"])
    expr = _MERGE_SPARK.format(sym="sym", p1="_p1", p2="_p2")
    got = {
        (r["sym"], r["_p1"], r["_p2"]): r["merged"]
        for r in df.selectExpr("sym", "_p1", "_p2", f"{expr} AS merged").collect()
    }
    for sym, p1, p2 in CASES:
        assert got[(sym, p1, p2)] == ref_merge(sym, p1, p2), (sym, p1, p2)


def test_merge_fold_matches_reference_duck():
    import duckdb

    con = duckdb.connect()
    expr = _MERGE_DUCK.format(sym="sym", p1="p1", p2="p2")
    for sym, p1, p2 in CASES:
        (merged,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS sym, ? AS p1, ? AS p2)",
            [sym, p1, p2],
        ).fetchone()
        assert merged == ref_merge(sym, p1, p2), (sym, p1, p2)


# --- full-pipeline reference: train on a tiny hand vocabulary --------------
def ref_train(word_freq: dict[str, int], steps: int) -> list[tuple[int, str, int]]:
    vocab = {" ".join(w): f for w, f in word_freq.items()}
    merges = []
    for step in range(1, steps + 1):
        counts: dict[str, int] = {}
        for sym, f in vocab.items():
            s = sym.split(" ")
            for a, b in zip(s, s[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((step, pair, counts[pair]))
        p1, p2 = pair.split(" ")
        vocab = {ref_merge(sym, p1, p2): f for sym, f in vocab.items()}
    return merges


def test_duck_unroll_matches_python_reference():
    """The full DuckDB CTE unroll (the oracle's core) on a constructed
    vocabulary with a tie and a chained merge."""
    import duckdb

    docs = (
        ["low low low lower lowest"] * 3
        + ["new newer newest"] * 2
        + ["aaaa aaaa aa"]
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (SELECT UNNEST(?) AS text)",
        [docs],
    )
    sql = f"""
WITH {_duck_train_ctes()}
SELECT step, pair, cnt FROM (
    {" UNION ALL ".join(f"SELECT step, pair, cnt FROM b{i}" for i in range(1, _BPE_STEPS + 1))}
) ORDER BY step
"""
    got = [(int(s), p, int(c)) for s, p, c in con.execute(sql).fetchall()]

    from collections import Counter

    wf = Counter(w for d in docs for w in d.split() if len(w) >= 2)
    assert got == ref_train(dict(wf), _BPE_STEPS)


@pytest.mark.parametrize("name", ["bpe_merge_train", "bpe_apply_fertility"])
def test_bpe_queries_match_oracle(spark, sf_dir, name):
    from makerdao_dw_spark.queries import oracles_dict, queries_dict

    from .conftest import compare_with_oracle

    compare_with_oracle(spark, name, queries_dict()[name], oracles_dict()[name], sf_dir)


def test_bpe_degenerate_fully_fused(spark, tmp_path):
    """A corpus whose pairs are exhausted before _BPE_STEPS must carry
    the previous segmentation forward, not empty the vocabulary — the
    old CROSS JOIN against an empty per-step argmax emptied it on BOTH
    engines, so oracle agreement alone hid the wrong semantics (round-8
    ADVICE). Asserts cross-engine agreement AND the absolute answer."""
    from makerdao_dw_spark.queries import oracles_dict, queries_dict

    from .conftest import compare_with_oracle

    import pyarrow as pa
    import pyarrow.parquet as pq

    # one parquet FILE (not a Spark part-dir): the oracle side reads the
    # same path with DuckDB's read_parquet
    pq.write_table(
        pa.table(
            {"doc_id": [1, 2], "lang": ["en", "de"], "text": ["ab ab cd", "ab"]}
        ),
        str(tmp_path / "documents.parquet"),
    )
    qd, od = queries_dict(), oracles_dict()
    for name in ("bpe_merge_train", "bpe_apply_fertility"):
        compare_with_oracle(spark, name, qd[name], od[name], str(tmp_path))
    # pairs exhaust after 2 merges: (a b) freq 3, then (c d) freq 1
    train = qd["bpe_merge_train"](spark, str(tmp_path)).collect()
    assert [(r["step"], r["pair"], r["cnt"]) for r in train] == [
        (1, "a b", 3),
        (2, "c d", 1),
    ]
    # every word fully fused -> vocabulary NON-empty, fertility exactly 1
    fert = {
        r["lang"]: (r["n_words"], r["n_tokens"], float(r["fertility"]))
        for r in qd["bpe_apply_fertility"](spark, str(tmp_path)).collect()
    }
    assert fert == {"en": (3, 3, 1.0), "de": (1, 1, 1.0)}
