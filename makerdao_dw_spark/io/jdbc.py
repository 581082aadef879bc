"""JDBC source/sink: warehouse interop parity (PostgreSQL / Snowflake).

The reference writes to PostgreSQL or Snowflake one INSERT at a time
inside a per-range transaction (classes.py:119-127,166-171) — its own
README calls the single-row path out as the bottleneck (README.md:104).
The Spark-native equivalent is the JDBC batch writer: `batchsize` rows
per round-trip per partition, `numPartitions` parallel connections.

No JDBC driver jars ship in this environment, so these wrappers are
config builders + thin `spark.read/write.jdbc` calls; the round-trip is
exercised against a real warehouse by supplying the driver jar via
`spark.jars` at session build. Everything here is plain public Spark API.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection parameters (the reference's template.conf:5-14 db block:
    driver/host/port/database/user/password — secrets from config, never
    hardcoded; fixes the committed-API-key mistake of functions.py:28)."""

    url: str  # jdbc:postgresql://host:5432/db | jdbc:snowflake://account/...
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    def properties(self) -> dict[str, str]:
        return {"user": self.user, "password": self.password, "driver": self.driver}


def read_jdbc(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Partitioned JDBC scan: slice `table` on a numeric column (for the
    reference's tables: always block_number) so N executors read in
    parallel instead of one serial cursor."""
    r = spark.read.format("jdbc").option("url", cfg.url).option("dbtable", table)
    for k, v in cfg.properties().items():
        r = r.option(k, v)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()


def write_jdbc(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Batched JDBC sink (the fix for the reference's row-at-a-time
    INSERT): `batchsize` rows per statement, one connection per
    partition. Repartition first if the upstream parallelism would open
    too many warehouse connections."""
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**cfg.properties())
        .mode(mode)
        .save()
    )
