

"""Python DataSource writer-protocol tests (jsonlsink)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Writer protocol: staged files are only published by the driver
    commit (atomic renames + manifest); data round-trips; no staging
    residue survives a successful write."""
    import json
    import os

    from makerdao_dw_spark.ingest.datasource import register_jsonl_sink
    from makerdao_dw_spark.session import load_table

    from .conftest import SF_DIR

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    src = load_table(spark, SF_DIR, "nation")
    src.write.format("jsonlsink").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = sorted(os.listdir(out))
    assert "_staging" not in files, "staging dir must not survive commit"
    assert {m["file"] for m in manifest} == {f for f in files if f.endswith(".jsonl")}
    assert sum(m["rows"] for m in manifest) == src.count()

    rows = []
    for f in files:
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh]
    got = {(r["n_nationkey"], r["n_name"]) for r in rows}
    want = {(r.n_nationkey, r.n_name) for r in src.collect()}
    assert got == want


def test_jsonl_sink_append_merges_manifest_and_overwrite_clears(spark, tmp_path):
    """Append keeps the manifest as the union of ALL committed writes;
    overwrite clears previously committed files."""
    import json
    import os

    from makerdao_dw_spark.ingest.datasource import register_jsonl_sink
    from makerdao_dw_spark.session import load_table

    from .conftest import SF_DIR

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink2")
    os.makedirs(out)
    region = load_table(spark, SF_DIR, "region")
    nation = load_table(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("v")
    )
    r2 = region.select(F.col("r_regionkey").alias("k"), F.col("r_name").alias("v"))

    r2.write.format("jsonlsink").option("path", out).mode("append").save()
    nation.write.format("jsonlsink").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert sum(m["rows"] for m in manifest) == region.count() + nation.count()
    assert {m["file"] for m in manifest} == {
        f for f in os.listdir(out) if f.endswith(".jsonl")
    }

    r2.write.format("jsonlsink").option("path", out).mode("overwrite").save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert sum(m["rows"] for m in manifest) == region.count()
    files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert {m["file"] for m in manifest} == files
