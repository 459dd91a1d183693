"""Entity resolution: blocked fuzzy matching of dirty records back to
a master table — the record-linkage step of any ingestion pipeline
that receives hand-keyed or OCR'd identifiers.

A deterministic "dirty feed" is derived from the customer master
(three corruption modes keyed by custkey — char drop, digit->letter
substitution, appended char), then resolved back by blocking +
Levenshtein.  Ground truth is known by construction, so the match
table is fully verifiable: every dirty record must resolve to exactly
its source row, at the edit distance its corruption mode implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table

# 'Customer#000000123' (18 chars) -> every corruption mode touches only
# position >= 17, so a 16-char prefix block key puts each dirty record
# in its source's block while bounding blocks at ~100 rows (only the
# last 2 digits vary) INDEPENDENT of SF -- prefix-14 would collapse to
# one giant quadratic block once custkeys pass 10000.
_CORRUPT_SQL = """
CASE c_custkey % 3
  WHEN 0 THEN substr(c_name, 1, length(c_name) - 1)
  WHEN 1 THEN substr(c_name, 1, length(c_name) - 1) || 'O'
  ELSE c_name || 'x'
END
"""


@spark_query(
    "q_fuzzy_join_names",
    oracle=f"""
WITH dirty AS (
  SELECT c_custkey AS dirty_id, {_CORRUPT_SQL} AS dirty_name,
         substr(c_name, 1, 16) AS blk
  FROM customer
),
master AS (
  SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer
)
SELECT d.dirty_id, d.dirty_name, m.c_custkey AS matched_id,
       levenshtein(d.dirty_name, m.c_name) AS edit_dist,
       (m.c_custkey = d.dirty_id) AS is_true_match
FROM dirty d
JOIN master m ON m.blk = d.blk
WHERE levenshtein(d.dirty_name, m.c_name) <= 1
ORDER BY d.dirty_id, m.c_custkey
""",
)
def q_fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join: dirty names resolved against the master by
    prefix blocking + Levenshtein <= 1.

    The block key (16-char prefix) is chosen so every corruption mode
    preserves it and block size stays ~100 at any SF — recall stays 100% while the candidate space drops
    from |dirty| x |master| to the within-block product; ``levenshtein``
    is exact integer DP in both engines, so the match set hash-matches.
    ``is_true_match`` exposes precision directly in the output (near-ID
    names sit at edit distance 1 of each other, so some blocks produce
    honest false candidates — that ambiguity IS the entity-resolution
    problem, visible and measurable here).

    Scale: blocked equi-join + a per-pair O(len^2) scalar — the same
    shape as q_jaccard_block; at 100 TB the block key comes from a
    phonetic/normalized form and skewed blocks get salted (the repo's
    q_skew_salted_join pattern)."""
    c = load_table(spark, sf_dir, "customer")
    # The fixture table is one parquet file -> one scan partition, which
    # would serialize every levenshtein evaluation into a single task
    # (measured 11 s at sf0.1).  Re-shard the probe side across the
    # cluster before the broadcast join; at 100 TB inputs are already
    # multi-partition and this repartition coalesces into the scan.
    dirty = c.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("c_custkey").alias("dirty_id"),
        F.expr(_CORRUPT_SQL).alias("dirty_name"),
        F.substring("c_name", 1, 16).alias("blk"),
    )
    master = c.select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    dist = F.levenshtein("dirty_name", "c_name")
    return (
        dirty.join(master, "blk")
        .filter(dist <= 1)
        .select(
            "dirty_id",
            "dirty_name",
            F.col("c_custkey").alias("matched_id"),
            dist.alias("edit_dist"),
            (F.col("c_custkey") == F.col("dirty_id")).alias("is_true_match"),
        )
        .orderBy("dirty_id", "matched_id")
    )
