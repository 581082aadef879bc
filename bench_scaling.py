#!/usr/bin/env python
"""Scaling probe: core operator throughput as data grows.

Synthesizes datasets (deterministic spark.range arithmetic — no files,
isolates compute from IO) and times hash aggregation, fact-fact join,
and a cumulative window at increasing row counts. The number that
matters is rows/sec STAYING FLAT as rows grow — that is what "survives
a 100x scale-up" means for compute; IO scaling is the storage layout's
job (SCALE.md). Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from makerdao_dw_spark.session import get_spark

SIZES = [1_000_000, 4_000_000, 16_000_000]
DOC_SIZES = [50_000, 200_000, 800_000]


def synth(spark, n):
    return spark.range(0, n, 1).select(
        F.col("id"),
        (F.col("id") % 100_000).alias("k"),
        (F.col("id") % 97).alias("grp"),
        ((F.col("id") * 2_654_435_761) % 1_000_000).alias("v"),
    )


def t(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("makerdao-dw-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for n in SIZES:
        df = synth(spark, n)
        dim = synth(spark, 100_000).select(F.col("k").alias("dk"), F.col("v").alias("dv")).distinct()
        agg = lambda: df.groupBy("grp").agg(
            F.sum(F.col("v").cast("decimal(38,6)")), F.count(F.lit(1))
        ).collect()
        join = lambda: df.join(dim, df["k"] == dim["dk"]).agg(F.count(F.lit(1))).collect()
        win = lambda: df.select(
            F.sum("v").over(Window.partitionBy("k").orderBy("id")).alias("c")
        ).agg(F.max("c")).collect()
        out[str(n)] = {
            "agg_mrows_s": round(n / t(agg) / 1e6, 1),
            "join_mrows_s": round(n / t(join) / 1e6, 1),
            "window_mrows_s": round(n / t(win) / 1e6, 1),
        }
    # training-data plane: per-doc CPU ops (synthetic ~40-word docs built
    # from arithmetic so the probe isolates expression throughput)
    from makerdao_dw_spark.operators.text_features import minhash_signature, shingles_expr

    for n in DOC_SIZES:
        docs = spark.range(0, n, 1).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.expr("transform(sequence(1, 40), i -> concat('w', (id * i) % 50))"), " "
            ).alias("text"),
        )
        sig = lambda: docs.select(
            shingles_expr("text").alias("sh")
        ).select(minhash_signature("sh", 16).alias("s")).agg(
            F.sum(F.expr("element_at(s, 1)"))  # forces the computation: count(1) would let Catalyst prune the signature entirely
        ).collect()
        rep = lambda: docs.select(
            F.expr(
                "size(filter(split(text, ' '), x -> x != '')) as nw"
            )
        ).agg(F.sum("nw")).collect()
        out.setdefault("docs", {})[str(n)] = {
            "minhash_krows_s": round(n / t(sig) / 1e3, 1),
            "tokenize_krows_s": round(n / t(rep) / 1e3, 1),
        }
    print(json.dumps({"metric": "scaling_mrows_per_sec", "sizes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
