"""Unit tests for operators/quality.py on a constructed frame with known
violations of every constraint kind."""

from __future__ import annotations

from pyspark.sql import functions as F

from makerdao_dw_spark.operators.quality import (
    accepted_values,
    foreign_key,
    in_range,
    matches,
    not_null,
    run_suite,
    unique_key,
)


def test_quality_suite_counts(spark):
    rows = [
        # (id, status, score, ref)
        (1, "ok", 10.0, 100),
        (2, "ok", -5.0, 100),      # range violation (lo=0)
        (3, "bad!", 20.0, 999),    # accepted_values + matches + FK violation
        (3, "ok", 30.0, 100),      # duplicate id (with row above: 2 rows in dup key)
        (4, None, 200.0, None),    # null status; range violation (hi=100); null ref ok for FK
    ]
    df = spark.createDataFrame(rows, "id int, status string, score double, ref int")
    parent = spark.createDataFrame([(100,), (200,)], "pk int")

    out = run_suite(
        df,
        [
            not_null("status"),
            in_range("score", lo=0, hi=100),
            accepted_values("status", ["ok", "warn"]),
            matches("status", "^[a-z]+$"),
        ],
        [
            unique_key(df, ["id"]),
            foreign_key(df, "ref", parent, "pk"),
        ],
    )
    got = {r["constraint"]: (r["n_checked"], r["n_violations"]) for r in out.collect()}
    assert got == {
        "not_null(status)": (5, 1),
        "in_range(score)": (5, 2),
        "accepted_values(status)": (5, 1),
        "matches(status)": (5, 1),
        "unique_key(id)": (5, 2),
        "foreign_key(ref)": (5, 1),
    }


def test_quality_scalar_checks_share_one_scan(spark):
    """All scalar constraints must fold into a single aggregation over a
    single scan — adding a check must not add a pass."""
    rows = [(1, "a", 1.0), (2, "b", 2.0)]
    df = spark.createDataFrame(rows, "id int, s string, v double")
    out = run_suite(
        df,
        [not_null("s"), in_range("v", lo=0), accepted_values("s", ["a", "b"])],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("localrelation") + plan.lower().count("logicalrdd") == 1, plan


def test_observed_metrics_free_with_export(spark):
    """observe(): DQ counters accumulate in the same job as the export
    action and match a dedicated recompute."""
    from makerdao_dw_spark.operators.quality import in_range, not_null, observed
    from makerdao_dw_spark.session import load_table

    from .conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    checks = [not_null("o_custkey"), in_range("o_totalprice", lo=0.0)]
    out, obs = observed(o.filter(F.col("o_orderstatus") != "X"), "dq_orders", checks)
    n = out.count()  # the "export" action
    got = obs.get
    assert got["n_rows"] == n
    exact_null = o.filter(F.col("o_custkey").isNull()).count()
    exact_neg = o.filter(F.col("o_totalprice") < 0).count()
    assert got["not_null(o_custkey)"] == exact_null
    assert got["in_range(o_totalprice)"] == exact_neg


def test_lsh_bucket_cap_bounds_pathological_corpus(spark, tmp_path):
    """The guard scenario itself: thousands of near-identical docs land
    in the same band buckets; without the cap the in-bucket pair
    expansion is quadratic (2000 docs -> ~2M pairs per bucket). With
    the production cap the oversized buckets are EXCLUDED from pair
    expansion (bounded output) while the overflow side-channel reports
    them — nothing silently dropped."""
    import pyspark.sql.functions as F

    from makerdao_dw_spark.queries import dedup as D

    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("identical boilerplate text repeated across the corpus many times over")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(70).cast("long").alias("n_chars"),
    )
    path = str(tmp_path)
    docs.write.mode("overwrite").parquet(path + "/documents.parquet")

    cap_orig = D.LSH_BUCKET_CAP
    try:
        D.LSH_BUCKET_CAP = 100  # force the guard to trigger at test size
        pairs = D.dedup_minhash_lsh(spark, path)
        n_pairs = pairs.count()
        overflow = D.dedup_minhash_lsh_overflow(spark, path)
        over_rows = overflow.collect()
    finally:
        D.LSH_BUCKET_CAP = cap_orig

    # identical docs share ALL band buckets -> every bucket is over-cap:
    # pair expansion must produce NOTHING instead of ~2M pairs/bucket...
    assert n_pairs == 0, n_pairs
    # ...and the overflow channel must report each full bucket
    assert over_rows, "overflow side-output must surface the capped buckets"
    assert all(r.bucket_size == n for r in over_rows), over_rows[:3]
    # the audit flag must agree with the guard that actually dropped them
    assert all(r.over_production_cap for r in over_rows), over_rows[:3]


def test_cc_oracle_honors_bucket_cap(spark, tmp_path):
    """Round-4 review finding: _CC_ORACLE used to build its edge set
    WITHOUT the LSH_BUCKET_CAP filter the Spark side applies, so on any
    corpus with an over-cap bucket the oracle merged docs the engine
    (correctly) refused to pair — a driver hash-fail waiting for real
    data. With 1100 identical docs (> LSH_BUCKET_CAP=1000) both sides
    must now agree: no edges, no components."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from makerdao_dw_spark.queries import dedup as D

    from .conftest import compare_with_oracle

    n = D.LSH_BUCKET_CAP + 100
    text = "identical boilerplate text repeated across the corpus many times over"
    path = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": [text] * n,
                "lang": ["en"] * n,
                "source": ["synthetic"] * n,
                "n_chars": [len(text)] * n,
            }
        ),
        os.path.join(path, "documents.parquet"),
    )

    compare_with_oracle(
        spark,
        "dedup_connected_components",
        D.dedup_connected_components,
        D._CC_ORACLE,
        path,
    )
    # and the agreement is the empty one (every bucket over-cap)
    assert D.dedup_connected_components(spark, path).count() == 0


def test_prefix_filter_recall_equals_bruteforce(spark):
    """The prefix filter must be LOSSLESS at threshold t: candidates
    pruned by the floor((1-t)*n)+1 float formula silently lost pairs
    whenever t*n was an integer (found in round 4 — the exact-integer
    ceil now guarantees the lemma). Compare against the brute-force
    all-pairs Jaccard on the small corpus."""
    import duckdb

    from makerdao_dw_spark.queries.dedup import _PF_T, dedup_prefix_filter_jaccard

    import os

    # the SMALL corpus on purpose (brute force is O(N^2) sets), but
    # derived from the suite's corpus root so a relocated tree fails
    # loudly instead of silently testing stale data
    from .conftest import SF_DIR

    sf_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    assert os.path.exists(os.path.join(sf_dir, "documents.parquet")), sf_dir
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_prefix_filter_jaccard(spark, sf_dir).collect()
    }

    from makerdao_dw_spark.operators.text_features import shingles_sql_duckdb

    sh = shingles_sql_duckdb("text")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = set(
        con.sql(f"""
WITH sets AS (
    SELECT doc_id, list_distinct({sh}) AS ts, len(list_distinct({sh})) AS n
    FROM documents
)
SELECT a.doc_id, b.doc_id FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      / (a.n + b.n - len(list_intersect(a.ts, b.ts))) >= {_PF_T}
""").fetchall()
    )
    con.close()
    # PAIR-SET equality, not count equality: a lost true pair offset by
    # a spurious one must not pass
    assert got == want, (len(got), len(want), (got - want), (want - got))
