"""Domain function library, SQL-registered.

The reference's analytics hand-writes the Maker unit rescalings and
decodes inline every time (/root/reference/queries/makerdao/
assets_per_type.sql:31,43,44,51): `/10^18` (wad), `/10^27` (ray),
`/10^45` (rad), the per-second-ray → APY compounding, and the bytes32
ilk → text cleanup. Here they are engine functions, registered once per
session as Spark 4 SQL scalar UDFs (pure expressions — inlined by
Catalyst, codegen'd, NOT Python) plus Column-API twins for DataFrame
code.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

SECONDS_PER_YEAR = 3600 * 24 * 365

_SQL_FUNCTIONS = {
    "wad": (
        "CREATE OR REPLACE TEMPORARY FUNCTION wad(x DECIMAL(38,0)) "
        "RETURNS DECIMAL(38,18) RETURN x / CAST(1000000000000000000 AS DECIMAL(19,0))"
    ),
    "ray": (
        "CREATE OR REPLACE TEMPORARY FUNCTION ray(x DECIMAL(38,0)) "
        "RETURNS DECIMAL(38,18) "
        "RETURN CAST(x AS DECIMAL(38,9)) / CAST(1000000000000000000000000000 AS DECIMAL(28,0))"
    ),
    "rad": (
        "CREATE OR REPLACE TEMPORARY FUNCTION rad(x DECIMAL(38,0)) "
        "RETURNS DOUBLE RETURN CAST(x AS DOUBLE) / 1e45"
    ),
    "ray_apy": (
        # per-second compounding rate (ray) -> annual percentage yield;
        # double domain, exactly the reference's pow(.,3600*24*365)-1
        "CREATE OR REPLACE TEMPORARY FUNCTION ray_apy(duty DECIMAL(38,0)) "
        f"RETURNS DOUBLE RETURN pow(CAST(duty AS DOUBLE) / 1e27, {SECONDS_PER_YEAR}) - 1"
    ),
    "ilk_name": (
        # bytes32 collateral tag -> readable name (strip NUL padding)
        "CREATE OR REPLACE TEMPORARY FUNCTION ilk_name(b BINARY) "
        "RETURNS STRING RETURN replace(decode(b, 'UTF-8'), chr(0), '')"
    ),
}


def register_domain_functions(spark: SparkSession) -> None:
    """Idempotently register the domain functions in the session."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)


# Column-API twins (same arithmetic, for DataFrame pipelines)
def wad(c: Column) -> Column:
    return c.cast("decimal(38,0)") / F.lit(10**18).cast("decimal(19,0)")


def ray(c: Column) -> Column:
    return c.cast("decimal(38,9)") / F.lit(10**27).cast("decimal(28,0)")


def rad(c: Column) -> Column:
    return c.cast("double") / F.lit(1e45)


def ray_apy(c: Column) -> Column:
    return F.pow(c.cast("double") / F.lit(1e27), F.lit(SECONDS_PER_YEAR)) - 1


def ilk_name(c: Column) -> Column:
    return F.replace(F.decode(c, "UTF-8"), F.lit("\x00"), F.lit(""))
