"""Lakehouse table-format integration points (Delta / Iceberg / Hudi).

The v1 container ships no lakehouse jars, so these connectors are
import-gated stubs: the module documents exactly where each format
plugs in, probes availability at runtime, and fails with an actionable
message instead of a ClassNotFoundException mid-job.

At 100 TB a lakehouse format is what turns the partitioned-parquet
sink (q_sink_partitioned_parquet) into a managed table: ACID appends,
compaction, time travel, MERGE INTO for CDC/SCD2 (emulated today with
anti-join + union — see pyspark guide), and data-skipping statistics
that extend parquet row-group pruning to the table level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    # format -> (write format name, required session extension class)
    "delta": ("delta", "io.delta.sql.DeltaSparkSessionExtension"),
    "iceberg": ("iceberg", "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"),
    "hudi": ("hudi", "org.apache.spark.sql.hudi.HoodieSparkSessionExtension"),
}


def lakehouse_available(spark: SparkSession, fmt: str) -> bool:
    """True when the format's classes are on the session's classpath."""
    if fmt not in _FORMATS:
        raise KeyError(f"unknown lakehouse format: {fmt}")
    _, ext_class = _FORMATS[fmt]
    try:
        spark._jvm.java.lang.Class.forName(ext_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_lakehouse(df: DataFrame, fmt: str, path: str, mode: str = "append") -> None:
    """Write ``df`` as a lakehouse table, or raise with setup guidance.

    Production config (cluster-side, not code-side): add the format's
    jars + session extension to spark.jars.packages /
    spark.sql.extensions; everything above this function is unchanged
    because writes stay on the DataFrameWriter API."""
    spark = df.sparkSession
    if not lakehouse_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} jars are not on the classpath in this environment; "
            f"add the {fmt} package to spark.jars.packages and the "
            f"session extension {_FORMATS[fmt][1]} to spark.sql.extensions."
        )
    df.write.format(_FORMATS[fmt][0]).mode(mode).save(path)
