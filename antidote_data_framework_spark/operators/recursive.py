"""Recursive-query surface (Spark 4 WITH RECURSIVE): multi-hop graph
reachability as a recursive CTE — the fixpoint-query class (org
charts, BOM explosions, transitive closure) that previously needed a
driver loop (q_dedup_components, q_graph_pagerank unroll) now runs as
ONE declarative statement that Catalyst executes iteratively.

The SAME SQL text runs on Spark and on the DuckDB oracle (both
implement standard linear recursion with UNION ALL), so the whole
recursive execution hash-matches — the strongest possible check for a
brand-new engine feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import spark_query
from .graph import _CAPPED_LINES_SQL
from .reshape import register_views

# BFS over the supported co-purchase graph (same support>=2 edge rule
# as q_graph_triangles) from the smallest part id: per reachable node
# within 3 hops, the hop distance and the number of distinct walks.
# Shared recursion body; {edges} is the materialized edge relation —
# a temp view over a persisted DataFrame on the Spark side (the
# recursive executor re-evaluates every referenced plan PER STEP, so
# an inline 600k-row self-join CTE would be rebuilt each iteration —
# measured 15-24 s vs ~3 s materialized), the inline CTE on the
# DuckDB side (DuckDB materializes WITH members once).
# The self-join reads the SKEW_LINE_CAP-capped lines (graph.py) — the
# Spark side consumes support2_edges, which is built from the capped
# pair table, so the oracle must mirror the cap or the two sides
# diverge on any order with more than SKEW_LINE_CAP lines.
_EDGE_CTE = """
  SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
         GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
"""

# seed = highest-degree node (lowest id on ties): the hub explores the
# giant component; MIN(u) tended to land in 2-node islands at some SFs
_BFS_BODY = """
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM {edges} UNION ALL SELECT v FROM {edges}
  ) nn GROUP BY node
),
seed AS (SELECT node AS s FROM deg ORDER BY d DESC, node LIMIT 1),
reach(node, lvl) AS (
  SELECT s, 0 FROM seed
  UNION ALL
  SELECT CASE WHEN e.u = r.node THEN e.v ELSE e.u END, r.lvl + 1
  FROM reach r JOIN {edges} e ON e.u = r.node OR e.v = r.node
  WHERE r.lvl < 3
)
SELECT node,
       CAST(MIN(lvl) AS BIGINT) AS hops,
       CAST(COUNT(*) AS BIGINT) AS n_walks
FROM reach
GROUP BY node
ORDER BY hops, node
"""

# Non-recursive members (capped, und) are legal inside a WITH RECURSIVE
# list in both engines; only `reach` recurses.
_RECURSIVE_BFS_ORACLE = (
    "WITH RECURSIVE " + _CAPPED_LINES_SQL + ",\n"
    "und AS (" + _EDGE_CTE + "),\n"
    + _BFS_BODY.format(edges="und")
)


@spark_query("q_recursive_bfs", oracle=_RECURSIVE_BFS_ORACLE)
def q_recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS reachability from the smallest part in the supported
    co-purchase graph, written as a recursive CTE and executed by
    Spark 4's WITH RECURSIVE — hop distance = MIN(level) over all
    enumerated walks, walk count as the recursion's work witness.

    Scale shape: each recursion step is one join of the frontier
    against the edge table — the same per-iteration dataflow as the
    driver-loop operators (q_dedup_components), but planned and
    iterated inside the engine, so frontier re-distribution, reuse,
    and stop conditions live in one place.  Depth is bounded (lvl<3)
    — unbounded walk enumeration on a cyclic graph diverges; a
    production closure uses the distinct-frontier (UNION) form or the
    driver-loop label propagation the engine also ships."""
    register_views(spark, sf_dir)
    # Same support>=2 edge relation as q_graph_triangles — ride the
    # session-wide persisted build instead of re-deriving it from
    # SQL (the DataFrame and the _EDGE_CTE text define identical
    # content; the oracle keeps the inline CTE).
    from .graph import support2_edges

    und = support2_edges(spark, sf_dir)
    und.createOrReplaceTempView("bfs_edges")
    return spark.sql("WITH RECURSIVE " + _BFS_BODY.format(edges="bfs_edges").lstrip())
