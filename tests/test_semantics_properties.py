"""Property-based cross-engine semantics tests (hypothesis).

Two invariants that round-4's degenerate sweep caught single instances
of, generalized to random inputs:

1. The as-of join's strict-'<' tie semantics must match DuckDB's native
   ASOF JOIN on ANY event/order timing — including exact timestamp
   ties, multiple states per key, and keys with no prior state.
2. The PPJoin prefix-filter lemma (candidates ⊇ all pairs with
   J >= t) must hold for arbitrary token sets — the recall guarantee
   the exact-integer ceil(t*n) prefix length buys.

Each property runs a handful of examples per suite run (Spark jobs are
not cheap); hypothesis shrinks failures to minimal corpora.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.datetime(2024, 1, 1)

# timestamps drawn from a SMALL grid so ties are common (the interesting case)
_ts = st.integers(min_value=0, max_value=5).map(
    lambda h: BASE + datetime.timedelta(hours=h)
)
_events = st.lists(
    st.tuples(st.integers(0, 2), _ts), min_size=0, max_size=8
)  # (user, ts)
_orders = st.lists(
    st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=6
)  # (cust, ts)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events, orders=_orders)
def test_asof_strict_lt_matches_duckdb(spark, events, orders):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = [(i, u, t) for i, (u, t) in enumerate(events)]
    od = [(100 + i, u, t) for i, (u, t) in enumerate(orders)]

    # --- the engine's union + LOCF formulation (same shape as
    # asof_join_order_events, reduced to the id columns), INCLUDING the
    # production determinism contract: last_event_id in the window
    # orderBy, so among equal-(t) state rows the frame's final row is
    # the MAX event_id — without it, F.last() over ties is shuffle-order
    # dependent and this comparison is flaky by construction ---
    e = spark.createDataFrame(
        [(u, t, 0, eid, None) for eid, u, t in ev],
        "k long, t timestamp, is_probe int, last_event_id long, o_orderkey long",
    )
    o = spark.createDataFrame(
        [(u, t, 1, None, oid) for oid, u, t in od],
        "k long, t timestamp, is_probe int, last_event_id long, o_orderkey long",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_probe").desc(), F.col("last_event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        (r.o_orderkey, r.last_event_id)
        for r in e.unionByName(o)
        .withColumn("ff", F.last("last_event_id", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("o_orderkey", F.col("ff").alias("last_event_id"))
        .collect()
    }

    # --- DuckDB native ASOF (strict <) over the SAME dedup contract:
    # one state row per (user, ts) with MAX(event_id) — both engines now
    # implement the pinned determinism contract, so equality is exact,
    # not a bet on shuffle stability
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(eid BIGINT, u BIGINT, t TIMESTAMP)")
    con.execute("CREATE TABLE od(oid BIGINT, u BIGINT, t TIMESTAMP)")
    for eid, u, t in ev:
        con.execute("INSERT INTO ev VALUES (?, ?, ?)", [eid, u, t])
    for oid, u, t in od:
        con.execute("INSERT INTO od VALUES (?, ?, ?)", [oid, u, t])
    want = {
        (r[0], r[1])
        for r in con.execute(
            """
            WITH dedup_ev AS (
                SELECT u, t, MAX(eid) AS eid FROM ev GROUP BY u, t
            )
            SELECT od.oid, e.eid
            FROM od ASOF LEFT JOIN dedup_ev e
              ON od.u = e.u AND e.t < od.t
            """
        ).fetchall()
    }
    con.close()

    assert got == want, (sorted(got), sorted(want), ev, od)


_corpus = st.lists(
    st.lists(st.integers(0, 20), min_size=0, max_size=12),  # token-id sets
    min_size=2,
    max_size=10,
)


@settings(max_examples=50, deadline=None)
@given(corpus=_corpus)
def test_prefix_filter_lemma_lossless(corpus):
    """Pure-python check of the exact lemma the Spark/DuckDB prefix
    filter implements: order tokens by (global df, token), take each
    set's first n - ceil(t*n) + 1, and every pair with J >= t MUST
    share a prefix token. Uses the registered threshold constants."""
    from collections import Counter

    from makerdao_dw_spark.queries.dedup import _PF_DEN, _PF_NUM, _PF_T

    sets = [sorted(set(s)) for s in corpus]
    df = Counter(tok for s in sets for tok in s)
    order = {tok: (df[tok], tok) for s in sets for tok in s}

    def prefix(s):
        n = len(s)
        if n == 0:
            return set()
        ceil_tn = -((-(_PF_NUM * n)) // _PF_DEN)  # exact ceil(t*n)
        p = n - ceil_tn + 1
        assert 1 <= p <= n, (n, p)  # sanity: a real prefix, not the set
        return set(sorted(s, key=lambda tok: order[tok])[:p])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = set(sets[i]), set(sets[j])
            if not a or not b:
                continue
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= _PF_T:
                assert prefix(sets[i]) & prefix(sets[j]), (
                    sets[i],
                    sets[j],
                    jac,
                )
