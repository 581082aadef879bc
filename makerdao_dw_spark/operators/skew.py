"""Skew-resistant aggregation: explicit two-phase salting.

AQE's skew-join splitting handles join-side skew, but a heavily skewed
GROUP BY key (a handful of event types / contract addresses receiving
most rows) still funnels each hot key through one reducer in the final
exchange. Salting splits each key into `salt` subkeys for the first
(heavy) aggregation so the hot key's rows are reduced by many tasks,
then re-aggregates the tiny salted partials.

Only valid for algebraic aggregates (sum/count/min/max — anything with
an associative merge); that is exactly the map-side-combine family, so
the result is bit-identical to the unsalted plan for decimal/long
aggregates (and for doubles differs only by reassociation, same as any
parallel sum).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _reject_salt_column(df: DataFrame, side: str) -> None:
    """The internal spread column would silently OVERWRITE (withColumn
    replaces) and then consume a caller's same-named column — refuse
    loudly instead."""
    if "_salt" in df.columns:
        raise ValueError(
            f"{side} input already has a '_salt' column — the salting "
            "operators use that name internally and would clobber it; "
            "rename the caller's column first"
        )

# (partial_agg, final_merge) builders per supported aggregate
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    salt: int = 16,
) -> DataFrame:
    """GROUP BY `keys` with per-key salting.

    aggs: output_name -> (agg_fn_name, input_column). Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", F.lit(1)),
                    "total": ("sum", F.col("value").cast("decimal(38,6)"))})

    Plan: one shuffle on (keys, salt) carrying the full data, then one
    shuffle on keys carrying |keys| x salt rows (negligible). The hot
    key's reduction work spreads across `salt` tasks.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGES:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate {sorted(_MERGES)}")
    _reject_salt_column(df, "salted_agg")
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _MERGES[fn][0](col if isinstance(col, Column) else F.col(col)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGES[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big (skewed) side, replicate
    the small side.

    The at-scale problem: a shuffle join partitions the big side by
    `key`, so a whale key (one customer holding a large share of all
    fact rows) lands its entire row set on ONE reducer — the join runs
    as slow as its hottest key no matter how many executors exist, and
    AQE's skew splitting only helps sort-merge joins whose skewed
    partitions it can see post-shuffle. The explicit fix:

    - big side gains ``_salt = pmod(hash(salt_source), salt)`` — a
      deterministic spread column derived from a high-cardinality
      expression (pass the fact table's primary key; defaults to the
      join key itself, which spreads NOTHING for a whale key, so real
      callers always pass one), splitting the whale key's rows across
      `salt` distinct shuffle keys;
    - small side is replicated `salt` times via ``explode(sequence())``
      (|small| x salt rows — the pattern's cost, which is why `salt`
      stays O(10) and the small side is the dimension);
    - the join key becomes ``(key, _salt)``: every shuffle partition of
      the hot key holds ~1/salt of its rows, restoring parallelism.

    Result rows are identical to the unsalted join (each big row still
    meets exactly its matching small rows — once, under exactly one
    salt value). Supports inner and left joins; right/full would need
    unmatched-small-row dedup across replicas, so they are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    _reject_salt_column(big, "salted_join big")
    _reject_salt_column(small, "salted_join small")
    if salt_source is None:
        warnings.warn(
            "salted_join: salt_source defaulted to the join key — "
            "pmod(hash(key)) assigns a whale key's rows ONE salt value, "
            "spreading nothing; pass a high-cardinality column (e.g. the "
            "fact table's primary key) to actually split hot keys",
            stacklevel=2,
        )
        salt_source = F.col(key)
    big_s = big.withColumn("_salt", F.pmod(F.hash(salt_source), F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
