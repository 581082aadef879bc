"""IO plane tests: format round-trips preserve values and types,
partitioned writes prune on read, catalog tables work end-to-end, and
the JDBC adapter builds correct plans (no driver jar in this env, so the
JDBC write path is asserted up to the driver-load boundary)."""

from __future__ import annotations

import os

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from makerdao_dw_spark.io import ensure_database, read_any, save_table, write_any
from makerdao_dw_spark.io.catalog import table_exists
from makerdao_dw_spark.io.jdbc import JdbcConfig, write_jdbc
from makerdao_dw_spark.session import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def sample(spark):
    return load_table(spark, SF_DIR, "events").limit(200).cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_preserves_values(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_any(sample, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt, schema=sample.schema)
    a = sorted(map(tuple, sample.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b, f"{fmt}: first diff {next((x, y) for x, y in zip(a, b) if x != y)}"


def test_csv_json_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_any(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="schema"):
        read_any(spark, str(tmp_path), fmt="json")


def test_partitioned_write_prunes_on_read(spark, sample, tmp_path):
    """A filter on the partition column must turn into PartitionFilters
    (directory pruning), not a data filter over all files."""
    path = str(tmp_path / "part")
    df = sample.withColumn("day", F.to_date("ts"))
    write_any(df, path, fmt="parquet", partition_by=["day"])
    back = spark.read.parquet(path)
    one_day = back.select("day").distinct().first()["day"]
    q = back.filter(F.col("day") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "isnotnull(day" in plan, plan
    assert q.count() == df.filter(F.col("day") == F.lit(one_day)).count()


def test_catalog_database_and_table(spark, sample, tmp_path):
    """Schema namespace -> database; idempotent DDL (the two classes.py
    bugs — wrong exists-check and early break — impossible here)."""
    ensure_database(spark, "io_test_db")
    ensure_database(spark, "io_test_db")  # idempotent
    save_table(
        sample.select("event_id", "user_id", "value"),
        "io_test_db",
        "ev",
        mode="overwrite",
        path=str(tmp_path / "ev"),
    )
    assert table_exists(spark, "io_test_db", "ev")
    assert not table_exists(spark, "io_test_db", "EV_other")
    assert spark.table("`io_test_db`.`ev`").count() == sample.count()
    # append mode appends
    save_table(
        sample.select("event_id", "user_id", "value").limit(10),
        "io_test_db",
        "ev",
        mode="append",
        path=str(tmp_path / "ev"),
    )
    assert spark.table("`io_test_db`.`ev`").count() == sample.count() + 10
    spark.sql("DROP DATABASE io_test_db CASCADE")


def test_jdbc_write_reaches_driver_boundary(spark, sample):
    """Without a driver jar the batched JDBC sink must fail at driver
    load — proving the plan (url/batchsize/partitioning) is built
    correctly up to the warehouse boundary."""
    cfg = JdbcConfig(url="jdbc:postgresql://localhost:5/x", user="u", password="p")
    with pytest.raises(Py4JJavaError, match="(?i)driver|class"):
        write_jdbc(sample.limit(1), cfg, "t", num_partitions=2)


def test_compaction_reduces_files(spark, sample, tmp_path):
    from makerdao_dw_spark.io.maintenance import compact_table, table_layout_stats

    path = str(tmp_path / "frag")
    # fragment: 40 tiny files across 2 partitions (micro-batch accretion)
    frag = sample.withColumn("p", (F.col("event_id") % 2).cast("int")).repartition(20)
    frag.write.partitionBy("p").mode("overwrite").parquet(path)
    before = table_layout_stats(spark, path)
    assert before["n_files"] >= 20

    rows_before = spark.read.parquet(path).count()
    stats = compact_table(spark, path, partition_col="p")
    after = stats["after"]
    assert after["n_files"] < before["n_files"]
    assert after["total_bytes"] > 0
    df = spark.read.parquet(path)
    assert df.count() == rows_before
    assert {r["p"] for r in df.select("p").distinct().collect()} == {0, 1}


def test_sorted_write_enables_row_group_pruning(spark, tmp_path):
    """Clustered layout: after sorted_write on l_orderkey, row-group
    min/max ranges are pairwise disjoint (every range predicate can
    prune) and a narrow predicate can skip >=75% of row groups; the
    same data written unsorted prunes (near) nothing."""
    from makerdao_dw_spark.io.layout import pruning_ratio, row_group_ranges, sorted_write
    from makerdao_dw_spark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    lo_key, hi_key = 100, 200

    clustered = str(tmp_path / "clustered")
    sorted_write(li, clustered, ["l_orderkey"], num_files=8)
    ranges = sorted(row_group_ranges(clustered, "l_orderkey"))
    assert len(ranges) >= 8
    for (_, prev_max), (next_min, _) in zip(ranges, ranges[1:]):
        assert next_min >= prev_max  # disjoint-or-touching: stats are usable
    assert pruning_ratio(clustered, "l_orderkey", lo_key, hi_key) >= 0.75

    shuffled = str(tmp_path / "shuffled")
    li.repartition(8).write.parquet(shuffled)  # random round-robin layout
    assert pruning_ratio(shuffled, "l_orderkey", lo_key, hi_key) <= 0.25

    # the clustered table still reads back identically
    back = spark.read.parquet(clustered)
    assert back.count() == li.count()


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Multi-dim clustering: after zorder_write on (x, y), a narrow range
    predicate on EITHER dimension skips a large share of row groups —
    the property single-key sorted_write cannot give the trailing key
    (its y-pruning is ~0 on the same data)."""
    from pyspark.sql import functions as F

    from makerdao_dw_spark.io.layout import pruning_ratio, sorted_write, zorder_write

    # full 64x64 grid, 4 rows per cell — both dims uniform
    grid = (
        spark.range(64 * 64 * 4)
        .select(
            ((F.col("id") / 4).cast("long") % 64).alias("x"),
            ((F.col("id") / 256).cast("long") % 64).alias("y"),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(grid, zpath, ["x", "y"], bits=6, num_files=16)
    x_prune = pruning_ratio(zpath, "x", 10, 13)
    y_prune = pruning_ratio(zpath, "y", 10, 13)
    assert x_prune >= 0.5, x_prune
    assert y_prune >= 0.5, y_prune

    spath = str(tmp_path / "xsorted")
    sorted_write(grid, spath, ["x"], num_files=16)
    # leading key prunes great, trailing key prunes nothing
    assert pruning_ratio(spath, "x", 10, 13) >= 0.75
    assert pruning_ratio(spath, "y", 10, 13) <= 0.25

    back = spark.read.parquet(zpath)
    assert back.count() == grid.count()
    assert set(back.columns) == {"x", "y", "payload"}


def test_analyze_table_feeds_cbo_broadcast(spark, tmp_path):
    """ANALYZE TABLE must surface rowCount stats, and an analyzed
    dimension-sized table must auto-broadcast in a join WITHOUT an
    explicit hint (the CBO path the ingest jobs rely on at scale)."""
    from makerdao_dw_spark.io.catalog import analyze_table, ensure_database, save_table
    from makerdao_dw_spark.session import load_table

    from .conftest import SF_DIR

    ensure_database(spark, "statsdb")
    spark.sql("DROP TABLE IF EXISTS statsdb.nation_dim")
    nation = load_table(spark, SF_DIR, "nation")
    # external table at tmp_path: hermetic across sessions (a managed
    # table's warehouse dir outlives the per-session derby metastore,
    # and a fresh session then collides with the leftover location)
    save_table(
        nation, "statsdb", "nation_dim", mode="overwrite", path=str(tmp_path / "nation_dim")
    )
    stats = analyze_table(spark, "statsdb", "nation_dim", columns=["n_nationkey"])
    assert int(stats["rowCount"]) == nation.count()
    cust = load_table(spark, SF_DIR, "customer")
    j = cust.join(
        spark.table("statsdb.nation_dim"),
        cust["c_nationkey"] == F.col("n_nationkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:500]


def test_schema_evolution_abi_upgrade(spark, tmp_path):
    """ABI-upgrade simulation: a call table written pre-upgrade (5
    params) and post-upgrade (6 params) must read back as one table
    with the union schema, NULL for the new column on old rows."""
    from makerdao_dw_spark.io.formats import read_evolved

    path = str(tmp_path / "vat_call_file")
    v1 = spark.range(5).select(
        F.col("id").alias("block_number"),
        F.lit("i1").alias("ilk"),
        F.lit(1).alias("what"),
    )
    v1.write.mode("append").parquet(path)
    v2 = spark.range(5, 8).select(
        F.col("id").alias("block_number"),
        F.lit("i2").alias("ilk"),
        F.lit(2).alias("what"),
        F.lit("0xabc").alias("data_raw"),  # the upgraded ABI's new param
    )
    v2.write.mode("append").parquet(path)
    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"block_number", "ilk", "what", "data_raw"}
    rows = {r.block_number: r.data_raw for r in merged.collect()}
    assert len(rows) == 8
    assert rows[0] is None and rows[7] == "0xabc"
    # plain read of one generation still prunes to its own columns
    old_only = merged.filter(F.col("data_raw").isNull())
    assert old_only.count() == 5


def test_load_table_normalizes_every_parquet_timestamp_flavor(spark, tmp_path):
    """The driver's testdata has shipped TIMESTAMP(NANOS) (r1) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (r2+); plain UTC micros is
    the third plausible flavor. load_table must surface ALL of them as
    plain TimestampType with identical wall-clock values — the r2 bench/
    correctness breakage class, pinned."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from makerdao_dw_spark.session import load_table

    ts = [dt.datetime(2024, 1, 30, 12, 34, 56, 789000), dt.datetime(2024, 6, 1, 0, 0, 0)]
    flavors = {
        "micros_ntz": pa.timestamp("us"),
        "micros_utc": pa.timestamp("us", tz="UTC"),
        "nanos_ntz": pa.timestamp("ns"),
    }
    for name, typ in flavors.items():
        tbl = pa.table({"ts": pa.array(ts, type=typ), "events_id": [1, 2]})
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got = sorted(r.ts for r in df.select("ts").collect())
        assert got == sorted(ts), (name, got)
