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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
