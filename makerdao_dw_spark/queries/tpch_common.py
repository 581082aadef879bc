"""Shared exact-decimal money-math fragments for the TPC-H-shape waves.

ONE definition each: the determinism contract (cast to DECIMAL(38,6)
per row BEFORE SUM, so aggregation order can never flip low bits)
hinges on these exact expressions being identical in every query AND
every DuckDB oracle — the strings are dialect-neutral SQL, consumed by
Spark via F.expr and by DuckDB verbatim inside the oracle f-strings.
A precision/scale change made here propagates to both engines in every
wave at once; independent per-file copies could desynchronize while
every per-file gate still passes.
"""

# revenue: l_extendedprice * (1 - l_discount), exact per-row decimal
REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"

# quantity lifted to the common exact-decimal scale
QTY = "CAST(l_quantity AS DECIMAL(38,6))"
