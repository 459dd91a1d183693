"""Benchmark harness — times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1}

Timing methodology: one shared SparkSession (JVM startup excluded), a
warm-up scan of the fact table, then each query is executed once to
completion and fully materialized on the driver via the engine's
Arrow exchange path (``toPandas``); ``collect()`` is the fallback for
result schemas Arrow can't convert.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from antidote_data_framework_spark.session import get_spark  # noqa: E402
from antidote_data_framework_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")
    # Warm-up: JIT + parquet footer caches, excluded from per-query time.
    load_table(spark, sf_dir, "lineitem").count()

    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            try:
                df.toPandas()
            except Exception:
                df.collect()
            times[name] = round(time.time() - t0, 3)
            print(f"bench: {name} {times[name]:.2f}s", file=sys.stderr)
        except Exception as exc:  # a failing query must not kill the bench
            times[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
