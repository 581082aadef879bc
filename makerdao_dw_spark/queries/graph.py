"""Graph traversal queries: bounded BFS over a data-derived edge list.

The reference's warehouse implies graph-shaped questions (funds flowing
between contracts/addresses) but ships none; BFS is the missing
traversal primitive next to the connected-components operator used by
near-dup clustering (operators/graph.py). The edge list here is a
market-basket co-occurrence graph built from `lineitem` — two parts are
adjacent when some order contains both — which is real analytics
structure, not a synthetic grid.

Oracle: DuckDB recursive CTE (`WITH RECURSIVE walk(...)`) — a fully
independent implementation of the same bounded-shortest-hop semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import bfs_distances
from ..session import configure, load_table
from .registry import query

_BFS_ORACLE = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), walk(node, dist) AS (
  SELECT (SELECT MIN(l_partkey) FROM lineitem), 0
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3
)
SELECT node AS part, CAST(MIN(dist) AS INT) AS dist
FROM walk GROUP BY node ORDER BY part
"""


@query("bfs_part_cooccurrence", oracle=_BFS_ORACLE, tags=("graph", "bfs", "iterative"))
def bfs_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (<= 3) from the lowest part key through the
    co-purchase graph: frontier-expansion BFS (one join + one anti-join
    per level, driver-side loop only — operators/graph.py)."""
    configure(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    source = li.agg(F.min("l_partkey").alias("node"))
    return (
        bfs_distances(edges, source, max_hops=3)
        .select(F.col("node").alias("part"), "dist")
        .orderBy("part")
    )
