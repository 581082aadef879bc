"""Degenerate-corpus robustness sweep: EVERY registered query must run
(not necessarily return rows) against (a) all-EMPTY tables and (b) a
minimal 1-row corpus with edge-case values (empty text, zero vector).

This is the generalization of the round-4 landmine class: Spark 4's
default ANSI mode turns silent degeneracies into runtime throws
(DIVIDE_BY_ZERO on zero-norm cosines, INVALID_ARRAY_INDEX on <2-token
bigrams, descending sequence() on empty docs), and driver-side scalars
(counts, collected domains) can hit ZeroDivision in Python. A query
that crashes on empty input crashes on an empty PARTITION-slice of real
data too — e.g. a date-filtered window with no matches.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from makerdao_dw_spark.queries import queries_dict

from .conftest import SF_DIR

QUERIES = queries_dict()

# Queries whose construction is inherently data-dependent in ways an
# empty corpus cannot satisfy, with the reason pinned here:
SKIP_EMPTY = {
    # train k=8 centroids; fewer points than clusters is a genuine
    # user error the operator raises on (pinned in test_extensions)
    "ann_ivf_kmeans",
    "semdedup_kmeans_prune",
    "ann_pq_adc",  # 4 subspace codebooks, k=16 each (needs >= 16 vectors) — same kmeans_fit raise
    # IVF-shortlist KNN: same k=8 kmeans_fit raise (exact siblings
    # knn_label_classifier / classifier_eval_f1 still sweep clean)
    "knn_label_classifier_ann",
    "classifier_eval_f1_ann",
}


def _schemas():
    out = {}
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        out[t] = pq.read_schema(os.path.join(SF_DIR, f"{t}.parquet"))
    return out


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t, schema in _schemas().items():
        pq.write_table(schema.empty_table(), os.path.join(str(d), f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    """1-row tables with edge-case values: empty text, zero embedding."""
    d = tmp_path_factory.mktemp("tiny_sf")
    schemas = _schemas()
    rows = {
        "region": {"r_regionkey": [0], "r_name": ["R"]},
        "nation": {"n_nationkey": [0], "n_name": ["N"], "n_regionkey": [0]},
        "customer": {
            "c_custkey": [1], "c_name": ["c"], "c_nationkey": [0],
            "c_acctbal": [0.0], "c_mktsegment": ["S"],
        },
        "supplier": {"s_suppkey": [1], "s_name": ["s"], "s_nationkey": [0], "s_acctbal": [0.0]},
        "part": {"p_partkey": [1], "p_name": ["p"], "p_type": ["T"], "p_size": [1], "p_retailprice": [1.0]},
        "orders": None,  # fill from schema below
        "lineitem": None,
        "events": None,
        "documents": {"doc_id": [0], "text": [""], "lang": ["en"], "source": ["s"], "n_chars": [0]},
        "embeddings": None,
    }
    import datetime

    for t, schema in schemas.items():
        preset = rows.get(t)
        cols = {}
        for f in schema:
            if preset is not None and f.name in preset:
                cols[f.name] = preset[f.name]
                continue
            pt = f.type
            if pa.types.is_integer(pt):
                cols[f.name] = [1]
            elif pa.types.is_floating(pt):
                cols[f.name] = [0.0]
            elif pa.types.is_timestamp(pt):
                cols[f.name] = [datetime.datetime(2024, 1, 1)]
            elif pa.types.is_list(pt):
                cols[f.name] = [[0.0] * 64]  # the zero vector
            else:
                cols[f.name] = [""]
        tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in SKIP_EMPTY))
def test_runs_on_empty_corpus(spark, empty_dir, name):
    QUERIES[name](spark, empty_dir).collect()


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in SKIP_EMPTY))
def test_runs_on_tiny_degenerate_corpus(spark, tiny_dir, name):
    QUERIES[name](spark, tiny_dir).collect()


from makerdao_dw_spark.queries import oracles_dict  # noqa: E402

ORACLES = oracles_dict()


@pytest.mark.parametrize("name", sorted(n for n in ORACLES if n not in SKIP_EMPTY))
def test_tiny_corpus_matches_oracle(spark, tiny_dir, name):
    """Not just 'runs': Spark and DuckDB must AGREE on the degenerate
    corpus — catches one-engine-NULL-other-engine-inf/throw divergences
    that the shipped testdata never exercises."""
    from .conftest import compare_with_oracle

    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], tiny_dir)


# Engine-semantic difference, deliberately NOT papered over: Spark's
# ROLLUP/CUBE/GROUPING SETS emit NO rows over empty input, while DuckDB
# (following the standard's treatment of the () grouping set as a global
# aggregate) emits the grand-total row. Our engine IS Spark — these
# queries keep Spark semantics, and the divergence class is pinned here
# instead of hidden by a conditional union branch in four hot queries.
SKIP_EMPTY_COMPARE = {
    "rollup_returnflag",
    "cube_order_stats",
    "grouping_sets_events",
    "lang_source_rollup",
    "padding_waste_by_bucket",
}


def test_asof_null_event_type_on_winning_row(spark, tmp_path_factory):
    """The forward as-of join must report the MAX-event_id state row's
    event_type even when that event_type is NULL — NOT forward-fill the
    type from an older event (ADVICE r5, advanced.py): both payload
    columns ride one struct through the LOCF window, matching the
    oracle's MAX_BY(event_type, event_id). Two tied state rows, the
    winner's type NULL — the losing formulation returns 'click' here."""
    import datetime

    from .conftest import compare_with_oracle

    d = tmp_path_factory.mktemp("asof_null_ty")
    schemas = _schemas()
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    t1 = datetime.datetime(2024, 1, 2, 0, 0)
    overrides = {
        "events": {
            "event_id": [1, 2],
            "ts": [t0, t0],  # tied timestamps; max event_id (2) wins
            "user_id": [7, 7],
            "event_type": ["click", None],  # winner's type is NULL
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        },
        "orders": {
            "o_orderkey": [100],
            "o_custkey": [7],
            "o_orderstatus": ["O"],
            "o_totalprice": [1.0],
            "o_orderdate": [t1],
            "o_orderpriority": ["1"],
        },
    }
    for t, schema in schemas.items():
        if t in overrides:
            tbl = pa.table(overrides[t], schema=schema)
        else:
            tbl = schema.empty_table()
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))

    name = "asof_join_order_events"
    rows = QUERIES[name](spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["last_event_id"] == 2
    assert rows[0]["last_event_type"] is None  # NOT 'click'
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(d))


@pytest.mark.parametrize(
    "name",
    sorted(n for n in ORACLES if n not in SKIP_EMPTY | SKIP_EMPTY_COMPARE),
)
def test_empty_corpus_matches_oracle(spark, empty_dir, name):
    """Spark and DuckDB must agree on ALL-EMPTY tables too: global
    aggregates emit exactly one row on both engines, per-group ones
    emit zero — a divergence here surfaces on any empty partition
    slice of real data (e.g. a date filter with no matches)."""
    from .conftest import compare_with_oracle

    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], empty_dir)


def test_ks_drift_null_length_cross_engine(spark, tmp_path_factory):
    """ks_feature_drift must agree across engines when n_chars contains
    NULL: Spark's Window.orderBy sorts NULLS FIRST, DuckDB's OVER
    (ORDER BY x) NULLS LAST, so an unfiltered NULL row shifts every
    cumulative ECDF count on one engine only (reproduced in the wave-11
    review: ks_d 0.081081 vs 0.086486). Both sides now drop NULL
    lengths before the ECDF; this corpus pins that."""
    from .conftest import compare_with_oracle

    d = tmp_path_factory.mktemp("ks_null_len")
    schemas = _schemas()
    n = 40
    docs = {
        "doc_id": list(range(n)),
        "text": ["w"] * n,
        "lang": ["en"] * n,
        "source": ["s"] * n,
        # varied lengths plus one NULL — the divergence trigger
        "n_chars": [None if i == 7 else (i % 5) * 10 for i in range(n)],
    }
    for t, schema in schemas.items():
        if t == "documents":
            tbl = pa.table(docs, schema=schema)
        else:
            tbl = schema.empty_table()
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))

    name = "ks_feature_drift"
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(d))


def test_rfm_null_recency_cross_engine(spark, tmp_path_factory):
    """session_rfm_features must agree across engines when a user's
    MAX(ts) is NULL (all events untimestamped -> NULL recency): NTILE
    ordering NULLs defaults differ (Spark ASC = NULLS FIRST, DuckDB =
    NULLS LAST), which shifted every user's r_score on one engine only
    (wave-14 review repro: rfm_code 213 vs 113). Both sides now pin
    NULLS LAST; this corpus keeps it that way."""
    import datetime

    from .conftest import compare_with_oracle

    d = tmp_path_factory.mktemp("rfm_null_ts")
    schemas = _schemas()
    t0 = datetime.datetime(2024, 1, 1)
    events = {
        "event_id": [1, 2, 3, 4],
        "ts": [t0, None, t0 + datetime.timedelta(days=3), None],
        "user_id": [1, 2, 3, 2],  # user 2: all-NULL ts -> NULL recency
        "event_type": ["a"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0],
        "props": ["{}"] * 4,
    }
    for t, schema in schemas.items():
        tbl = (
            pa.table(events, schema=schema) if t == "events" else schema.empty_table()
        )
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))

    name = "session_rfm_features"
    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], str(d))


def test_ntile_null_user_id_cross_engine(spark, tmp_path_factory):
    """NTILE tie-break columns must be NULL-pinned too: a NULL user_id
    group tying with real users on the ordered metric shifted every
    tile on one engine only (Spark ASC = NULLS FIRST vs DuckDB NULLS
    LAST on the TIE-BREAK column — the wave-17 review repro, the same
    class as the wave-14 metric-column fix). Eight 1-event users (all
    tie on n_events/frequency) including one NULL user_id."""
    import datetime

    from .conftest import compare_with_oracle

    d = tmp_path_factory.mktemp("null_uid")
    schemas = _schemas()
    t0 = datetime.datetime(2024, 1, 1)
    events = {
        "event_id": list(range(1, 9)),
        "ts": [t0 + datetime.timedelta(days=i) for i in range(8)],
        "user_id": [1, 2, 3, None, 4, 5, 6, 7],
        "event_type": ["purchase", "view"] * 4,
        "value": [1.0] * 8,
        "props": ["{}"] * 8,
    }
    for t, schema in schemas.items():
        tbl = (
            pa.table(events, schema=schema) if t == "events" else schema.empty_table()
        )
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))

    from makerdao_dw_spark.queries import oracles_dict

    ORC = oracles_dict()
    for name in ("session_rfm_features", "ab_uplift_by_segment"):
        compare_with_oracle(spark, name, QUERIES[name], ORC[name], str(d))


def test_blb_degenerate_replicates_excluded(spark, tmp_path_factory):
    """bootstrap_blb_ci on a 1-order corpus: replicates drawing
    all-zero Poisson weights are degenerate and must NOT bias the
    bootstrap mean toward zero or leave ci_hi NULL (wave-17 review:
    mean_boot divided the non-NULL sum by ALL B replicates). Every
    surviving replicate's mean is the single order's price, so all
    three emitted statistics must equal it exactly."""
    import datetime

    from .conftest import compare_with_oracle

    d = tmp_path_factory.mktemp("blb_one_order")
    schemas = _schemas()
    orders = {
        "o_orderkey": [7],
        "o_custkey": [1],
        "o_orderstatus": ["F"],
        "o_totalprice": [144449.04],
        "o_orderdate": [datetime.datetime(2024, 1, 1)],
        "o_orderpriority": ["1-URGENT"],
    }
    for t, schema in schemas.items():
        tbl = (
            pa.table(orders, schema=schema) if t == "orders" else schema.empty_table()
        )
        pq.write_table(tbl, os.path.join(str(d), f"{t}.parquet"))

    name = "bootstrap_blb_ci"
    from makerdao_dw_spark.queries import oracles_dict

    compare_with_oracle(spark, name, QUERIES[name], oracles_dict()[name], str(d))
    rows = QUERIES[name](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert 0 < r["n_reps"] <= 40
    assert r["mean_boot"] == r["ci_lo"] == r["ci_hi"] == 144449.04


@pytest.fixture(scope="module")
def nullish_dir(tmp_path_factory):
    """Tables where NULLs are DECOUPLED across rows — one row NULLs
    only the entity ref (but carries EXTREME valid values, e.g. the
    global max ts), another NULLs only the time/metric columns, a
    third NULLs the remaining payload columns — plus two rows tying on
    typical ordering metrics. Surfaces (a) the cross-engine
    NULL-ordering divergence class (Spark ASC = NULLS FIRST, DuckDB =
    NULLS LAST) on metric AND tie-break window columns, (b) NULL
    propagation in string/array expressions, and (c) queries whose
    Spark side and oracle filter NULLs on DIFFERENT columns (the
    wave-19 CUPED midpoint bug class — invisible when all NULLs sit on
    one row)."""
    import datetime

    d = tmp_path_factory.mktemp("nullish_sf")
    schemas = _schemas()
    t0 = datetime.datetime(2024, 1, 1)

    def days(n):
        return t0 + datetime.timedelta(days=n)

    vec = [0.5] * 64
    vec2 = [0.25] * 64
    rows = {
        "region": {
            "r_regionkey": [0, 1, 2, 3],
            "r_name": ["R0", None, "R2", "R2"],
        },
        "nation": {
            "n_nationkey": [0, 1, 2, 3, 4],
            "n_name": ["N0", None, "N2", "N2", "N4"],
            "n_regionkey": [0, 2, 2, 2, None],
        },
        "customer": {
            "c_custkey": [1, 2, 3, 4, 5],
            "c_name": ["c1", None, "c3", "c3", "c5"],
            "c_nationkey": [0, 2, 2, 2, None],
            "c_acctbal": [10.0, 20.0, 5.0, 5.0, None],
            "c_mktsegment": ["S", "T", "T", "T", None],
        },
        "supplier": {
            "s_suppkey": [1, 2, 3, 4, 5],
            "s_name": ["s1", None, "s3", "s3", "s5"],
            "s_nationkey": [0, 2, 2, 2, None],
            "s_acctbal": [1.0, 3.0, 2.0, 2.0, None],
        },
        "part": {
            "p_partkey": [1, 2, 3, 4, 5],
            "p_name": ["p1", None, "p3", "p3", "p5"],
            "p_type": ["T1", "T2", "T3", "T3", None],
            "p_size": [1, 2, 3, 3, None],
            "p_retailprice": [1.0, 2.0, 3.0, 3.0, None],
        },
        "orders": {
            # row 2: NULL entity ref ONLY — carries the GLOBAL MAX
            # date and an extreme price; row 3: NULL metrics only
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [1, None, 3, 4, 5],
            "o_orderstatus": ["O", "O", None, "F", "F"],
            "o_totalprice": [100.0, 999.0, None, 50.0, 50.0],
            "o_orderdate": [days(0), days(9), None, days(2), days(2)],
            "o_orderpriority": ["1-URGENT", "2-HIGH", None, "3-MEDIUM", "3-MEDIUM"],
        },
        "lineitem": {
            "l_orderkey": [1, 2, 3, 4, 5],
            "l_partkey": [1, None, 3, 3, 5],
            "l_suppkey": [1, None, 3, 3, 5],
            "l_linenumber": [1, 1, None, 1, 1],
            "l_quantity": [1.0, 9.0, None, 2.0, 2.0],
            "l_extendedprice": [10.0, 90.0, None, 20.0, 20.0],
            "l_discount": [0.0, 0.2, None, 0.1, 0.1],
            "l_tax": [0.0, 0.2, None, 0.1, 0.1],
            "l_returnflag": ["N", "A", None, "R", "R"],
            "l_linestatus": ["O", "F", None, "F", "F"],
            "l_shipdate": [days(1), days(9), None, days(3), days(3)],
        },
        "events": {
            # row 2: NULL user ONLY, with the GLOBAL MAX ts (a midpoint
            # or anchor computed over a differently-filtered set moves);
            # row 3: NULL ts ONLY; row 4: NULL payload only
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": [days(0), days(10), None, days(2), days(2), days(3)],
            "user_id": [1, None, 2, 3, 3, 4],
            "event_type": ["purchase", "view", "view", None, "view", "view"],
            "value": [1.0, 5.0, 2.0, None, 2.0, 2.0],
            "props": ['{"k": 1}', "{}", "{}", None, "{}", "{}"],
        },
        "documents": {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["alpha beta gamma", None, "delta delta", "delta delta", "omega"],
            "lang": ["en", "en", "de", "de", None],
            "source": ["s1", "s1", "s2", "s2", None],
            "n_chars": [16, 10, 11, 11, None],
        },
        "embeddings": {
            "vec_id": [1, 2, 3, 4, 5],
            "label": [1, 1, 2, 2, None],
            "embedding": [vec, None, vec, vec, vec2],
        },
    }
    for t, schema in schemas.items():
        cols = rows[t]
        n = len(next(iter(cols.values())))
        # keep only schema fields, in schema order; extra fields in the
        # schema (if testdata evolves) fall back to NULLs
        data = {f.name: cols.get(f.name, [None] * n) for f in schema}
        pq.write_table(
            pa.table(data, schema=schema), os.path.join(str(d), f"{t}.parquet")
        )
    return str(d)


# NULL-key rows change which grouping-set rows exist only through
# engine-specific paths already pinned above; start with no skips and
# add pins ONLY with a documented engine-semantic reason.
SKIP_NULLISH_COMPARE: dict[str, str] = {}


@pytest.mark.parametrize(
    "name",
    sorted(n for n in ORACLES if n not in SKIP_EMPTY),
)
def test_nullish_corpus_matches_oracle(spark, nullish_dir, name):
    """Spark and DuckDB must AGREE on a corpus where every nullable
    non-key column carries a NULL and ordering metrics tie — the sweep
    form of the wave-14/17 NULL-ordering findings (a NULL metric OR
    tie-break under any window/NTILE shifts results on one engine only
    unless pinned NULLS LAST on both)."""
    if name in SKIP_NULLISH_COMPARE:
        pytest.skip(SKIP_NULLISH_COMPARE[name])
    from .conftest import compare_with_oracle

    compare_with_oracle(spark, name, QUERIES[name], ORACLES[name], nullish_dir)
