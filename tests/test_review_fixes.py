"""Regression tests for the round-4 review findings: cross-engine
landmines that were inert on the shipped testdata (no 6-decimal values,
no NULL charge columns, no customer exactly at the average balance) but
would have failed the driver gate on the data shapes below. Each test
builds the triggering corpus and runs the full Spark-vs-DuckDB compare.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from makerdao_dw_spark.queries import REGISTRY, oracles_dict, queries_dict

from .conftest import compare_with_oracle

QUERIES = queries_dict()
ORACLES = oracles_dict()


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(str(tmp_path), f"{name}.parquet"))


def test_stats_moments_exact_at_six_decimals(spark, tmp_path):
    """Squaring at DECIMAL(38,6) would round each product to 6dp in
    Spark (precision-cap overflow) while DuckDB keeps the wider exact
    product — values with >3 decimal places used to drift. The (18,6)
    formulation must match exactly."""
    vals = [i / 999983.0 for i in range(1, 4000)]  # full 6+dp mantissas
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_type": [("click", "view", "buy")[i % 3] for i in range(len(vals))],
                "value": vals,
            }
        ),
    )
    compare_with_oracle(
        spark, "stats_moments", QUERIES["stats_moments"], ORACLES["stats_moments"], str(tmp_path)
    )


def test_unpivot_matches_duckdb_on_null_charges(spark, tmp_path):
    """DuckDB UNPIVOT silently drops NULL cells; Spark stack() keeps
    them. With NULL l_tax/l_discount rows present both engines must
    agree (the Spark side now filters NULL amounts explicitly)."""
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": [100, 200, 300, 400],
                "l_linenumber": [1, 1, 2, 1],
                "l_extendedprice": [10.0, 20.0, None, 40.0],
                "l_discount": [0.1, None, 0.3, 0.0],
                "l_tax": [None, 0.02, 0.03, 0.04],
            }
        ),
    )
    name = "unpivot_lineitem_charges"
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))


def test_q22_boundary_customer_consistent(spark, tmp_path):
    """A customer whose balance EQUALS the positive-balance average must
    be excluded by both engines. The old avg-based predicate compared
    Spark DECIMAL(38,10) against DuckDB DOUBLE — an ulp could flip the
    boundary row; the multiplied-through exact form cannot."""
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_nationkey": [0, 0, 1, 1],
                # positive avg = (100.01+100.03+100.02)/3 = 100.02 exactly
                "c_acctbal": [100.01, 100.03, 100.02, -5.0],
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
            }
        ),
    )
    name = "q22_dormant_rich_customers"
    sdf = QUERIES[name](spark, str(tmp_path))
    rows = sdf.collect()
    # only customer 2 (100.03) is strictly above the 100.02 average
    assert [(r[0], r[1]) for r in rows] == [(0, 1)], rows
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))


def test_cosine_queries_survive_zero_vector(spark, tmp_path):
    """An all-zero embedding used to throw DIVIDE_BY_ZERO under Spark
    4's default ANSI mode in every cosine query (while DuckDB emitted
    inf/NaN rows). Degenerate vectors are now excluded on BOTH engines."""
    import random

    rng = random.Random(7)
    n = 120
    emb = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(n)]
    emb[0] = [0.0] * 64    # probe id 0 (vec_id % 100 == 0) is degenerate
    emb[50] = [0.0] * 64   # probe id 50 (% 25 == 0, % 10 == 0) too
    # exact-duplicate same-label pairs: same (label, SRP bucket) cell by
    # construction, cosine exactly 1 — keeps the pair/top-1/canonical
    # path of dedup_embedding_cosine exercised now that the (label, srp)
    # blocking makes most random vectors singleton-cell (the compare
    # would otherwise pass on near-empty results)
    emb[101] = list(emb[1])   # 101 % 4 == 1 % 4 -> same label
    emb[102] = list(emb[2])
    _write(
        tmp_path,
        "embeddings",
        pa.table(
            {
                "vec_id": list(range(n)),
                "embedding": pa.array(emb, type=pa.list_(pa.float32())),
                "label": [i % 4 for i in range(n)],
            }
        ),
    )
    for name in (
        "ann_bruteforce_topk",
        "ann_ivf_bucketed",
        "ann_srp_lsh",
        "quantize_embeddings_int8",
        "dedup_embedding_cosine",
    ):
        compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))
    # the duplicate pairs must be flagged with the duplicate dropped and
    # the smaller id elected canonical — pins the pair path is live
    got = {
        r["vec_id"]: (r["is_near_dup"], r["canonical_id"])
        for r in QUERIES["dedup_embedding_cosine"](spark, str(tmp_path)).collect()
    }
    assert got[101] == (True, 1), got.get(101)
    assert got[102] == (True, 2), got.get(102)
    assert got[1] == (True, 1), got.get(1)


def test_bigram_survives_short_documents(spark, tmp_path):
    """sequence(1, size-1) DESCENDS on <2-token docs and ts[1] threw
    INVALID_ARRAY_INDEX under ANSI; the slice-zip formulation must
    yield zero bigrams for them and still match DuckDB."""
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": ["", "a", "ab", "alpha beta alpha beta", "alpha beta"]
                + [],
                "lang": ["en"] * 5,
                "source": ["s"] * 5,
                "n_chars": [0, 1, 2, 21, 10],
            }
        ),
    )
    name = "ngram_bigram_topk"
    sdf = QUERIES[name](spark, str(tmp_path))
    assert sdf.count() == 0  # n>=5 threshold unmet, but it must not crash
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(tmp_path))


def test_norm_hash_twins_identical(spark):
    """The hoisted normalization pair (text_common.norm_hash vs
    NORM_HASH_DUCK) must hash identically on both engines — including
    punctuation runs, tabs/newlines (NOT collapsed: the keep-class
    turns them into spaces first), digits, and an already-clean text."""
    import duckdb

    from makerdao_dw_spark.queries.text_common import NORM_HASH_DUCK, norm_hash

    texts = [
        "Hello,   World!! 123",
        "a\tb\nc",
        "already clean text",
        "___",
        "MiXeD CaSe-with-dashes  and   runs",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in sdf.select(norm_hash("text")).collect()]
    con = duckdb.connect()
    want = [
        con.sql(f"SELECT {NORM_HASH_DUCK} FROM (SELECT ? AS text)", params=[t]).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == want, list(zip(texts, got, want))


def test_tokens_arr_non_ascii_cross_engine(spark):
    """tokens_arr vs tokens_arr_duck must be token-identical on
    NON-ASCII input (r8 advice): case folding must never run before the
    letter-class delete. 'İ' lowercases to 'i'+U+0307 (would mint an
    extra 'i' token), Kelvin sign U+212A lowercases to 'k', 'ß' to
    'ss' — all must be DELETED like the duck twin deletes them, not
    folded into tokens."""
    import duckdb

    from makerdao_dw_spark.queries.text_common import tokens_arr, tokens_arr_duck

    texts = [
        "İstanbul is big",            # dotted capital I
        "temp 300K outside",     # Kelvin sign -> would fold to 'k'
        "straße and STRASSE",         # sharp s
        "naïve café crème",           # folding keeps non-ASCII -> deleted
        "ALL CAPS and MiXeD",         # pure-ASCII sanity
        "",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in sdf.select(tokens_arr("text")).collect()]
    con = duckdb.connect()
    want = [
        con.sql(
            f"SELECT {tokens_arr_duck('text')} FROM (SELECT ? AS text)", params=[t]
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == want, list(zip(texts, got, want))
