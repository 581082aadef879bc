"""Sort-aware table layout for scan pruning (Z-order-lite).

Parquet readers skip whole row groups whose column min/max statistics
exclude a pushed-down predicate. That only pays off if the writer
clusters values: a randomly-ordered table has every key range in every
row group, so min/max prune nothing. `sorted_write` materializes a
table range-partitioned AND sorted by the chosen clustering keys, so:

- each output file covers a disjoint key range (file-level pruning via
  footer stats),
- each row group within a file covers a narrow sub-range (row-group
  pruning),
- a point/range predicate on the leading key touches O(selectivity)
  of the bytes instead of all of them.

This is the plain-parquet version of what Delta/Iceberg call clustering
or Z-ordering (single-dimension case). The reference's analog is
implicit: block-ordered inserts mean its warehouse tables are naturally
clustered by block_number — `sorted_write` makes that property explicit
and re-establishable after shuffles/compaction.

At 100 TB: `repartitionByRange` samples the key distribution (range
boundaries are equi-depth, so skew in the clustering key does NOT skew
files), and the per-partition sort spills; cost is one shuffle — paid
once at write, repaid on every pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sorted_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on `cluster_by`: range-partition
    into `num_files` equi-depth key ranges, sort within each, write one
    file per range."""
    (
        df.repartitionByRange(num_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) statistics per row group across all files of a parquet
    directory — what a scan's row-group pruning consults. Driver-side
    metadata read (footers only, no data pages)."""
    import os

    import pyarrow.parquet as pq

    out: list[tuple] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        out.append((col.statistics.min, col.statistics.max))
    return out


def pruning_ratio(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups a [lo, hi] range predicate can skip based
    on footer statistics alone (1.0 = everything skippable but the hit
    range; 0.0 = stats useless, full scan)."""
    ranges = row_group_ranges(path, column)
    if not ranges:
        return 0.0
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


# ---------------------------------------------------------------------------
# True multi-dimension Z-order (Morton) clustering
# ---------------------------------------------------------------------------
def zorder_expr(cols: list[str], bits: int = 16) -> str:
    """Spark SQL expression computing the Morton (Z-order) value of two
    or more integer columns: each column is rank-normalized by the caller
    (or already integer-like), clamped to `bits` bits, and the bits are
    interleaved column-round-robin. Rows close in EVERY dimension get
    close z-values, so sorting by z clusters all dimensions at once —
    the multi-key generalization of `sorted_write`'s single-dimension
    clustering (what Delta/Iceberg call Z-ORDER BY).

    Pure Catalyst bit arithmetic (shiftleft/shiftright/bitwise or) —
    codegen'd, no UDF; cost is bits*|cols| ops per row, map-side.

    bits * len(cols) must stay <= 63: the top interleaved bit position
    is bits*n - 1, and position 63 is the bigint sign bit (a negative z
    breaks the sort order) while positions > 63 silently wrap.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_expr needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds 63: the interleaved value "
            f"would overflow the non-negative bigint range; use bits<={63 // n} "
            f"for {n} columns"
        )
    terms = []
    for j, c in enumerate(cols):
        # clamp to [0, 2^bits): callers pass small naturals or pre-ranked values
        clamped = f"least(greatest(cast({c} as bigint), 0L), {(1 << bits) - 1}L)"
        for b in range(bits):
            # bit b of column j lands at interleaved position b*n + j
            terms.append(
                f"shiftleft(shiftright({clamped}, {b}) & 1L, {b * n + j})"
            )
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    bits: int = 16,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` parquet Z-ordered on `cluster_by` (integer-like
    columns): compute the Morton value, range-partition + sort by it,
    drop the helper column. After this, a range predicate on ANY of the
    clustered dimensions prunes row groups — not just the leading key,
    which is `sorted_write`'s limitation.

    At 100 TB this is the layout for tables queried along two
    independent axes (block_number AND contract address; doc source AND
    language): one write-time shuffle buys O(selectivity) scans on both.
    """
    from pyspark.sql import functions as F

    z = F.expr(zorder_expr(cluster_by, bits))
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
