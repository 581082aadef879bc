"""Driver-sim: exercise __spark_entry__.py the way the external harness does.

- vanilla SparkSession (no custom confs)
- entry(spark) smoke at sf0.001: >0 rows, stable schema across 2 calls
- every queries()[name] at sf0.01 vs oracle_sql()[name] in DuckDB:
  compare row count, column-name set, and order-insensitive values
  (sorted columns by name, rows sorted; Decimal.normalize, float %.12g)
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    # STRICT: mirror the external driver — Decimal keeps its scale
    # ("4956.660000" != "4956.66"), int and float stringify differently
    # ("64" != "64.0"), and list/map cells are fatal (the driver's pandas
    # canonicalizer crashes on them).
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v:.12g}"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, dict, tuple, set)):
        raise TypeError(
            f"complex cell type {type(v).__name__} — driver canon crashes on these"
        )
    if v is None:
        return "<NULL>"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main(argv: list[str] | None = None) -> int:
    """Optional argv: `--no-entry` skips the entry() smoke; any other
    args are query-name substrings — only matching queries run (the
    quick-iteration / per-commit-gate mode)."""
    import __spark_entry__ as entrymod

    argv = list(sys.argv[1:] if argv is None else argv)
    run_entry = "--no-entry" not in argv
    name_filters = [a for a in argv if not a.startswith("--")]

    spark = SparkSession.builder.master("local[8]").appName("drive-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if run_entry:
        df1 = entrymod.entry(spark)
        schema1 = df1.schema.simpleString()
        n1 = len(df1.collect())
        df2 = entrymod.entry(spark)
        assert n1 > 0, "entry() returned 0 rows"
        assert df2.schema.simpleString() == schema1, "entry() schema unstable"
        print(f"entry() OK: {n1} rows, schema stable")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if name_filters:
        queries = {
            n: f for n, f in queries.items()
            if any(s in n for s in name_filters)
        }
        if not queries:
            print(f"no queries match filters {name_filters}")
            return 2
    failures = []
    t_start = time.time()
    for i, (name, fn) in enumerate(sorted(queries.items())):
        t0 = time.time()
        try:
            sdf = fn(spark, SF01)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"[{i+1}/{len(queries)}] {name}: SPARK ERROR")
            continue
        if name not in oracles:
            status = f"rows-only ({len(s_rows)} rows)"
            if len(s_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            print(f"[{i+1}/{len(queries)}] {name}: {status} {time.time()-t0:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"[{i+1}/{len(queries)}] {name}: DUCKDB ERROR")
            continue
        try:
            sc, sr = canon(s_cols, s_rows)
            dc, dr = canon(d_cols, d_rows)
        except TypeError as e:
            failures.append((name, f"canon error: {e}"))
            print(f"[{i+1}/{len(queries)}] {name}: CANON ERROR")
            continue
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
            print(
                f"[{i+1}/{len(queries)}] {name}: OK "
                f"({len(sr)} rows) {time.time()-t0:.1f}s"
            )
    print(f"total {time.time()-t_start:.1f}s")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"  {name}: {msg[:300]}")
        return 1
    print(f"ALL {len(queries)} QUERIES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
