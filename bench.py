"""Benchmark harness — times every registered query at $SPARK_GRAFT_SF_DIR.

Driver contract output (r01 lesson: the driver tail-captures stdout, so
a single enormous JSON line got truncated to an unparseable tail —
BENCH_r01.json recorded ``"parsed": null``):

- stdout line 1: the full contract JSON
  ``{"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": S}``.
- stdout last line: a COMPACT headline (metric/value/unit/sf +
  queries_file pointer) that stays complete even when only the tail
  of stdout is captured.
- the per-query second map is also written to ``bench_queries.json``
  next to this script (and echoed per-query on stderr as it runs).

Timing methodology: one shared SparkSession (JVM startup excluded), a
warm-up scan of the fact table, then each query is executed once to
completion and fully materialized on the driver.  The materialization
path is chosen BEFORE the timer starts from the result schema (Arrow
``toPandas`` for Arrow-convertible schemas, ``collect`` otherwise) —
r01 ADVICE: timing a failed toPandas + retry double-counted exactly
the queries most likely to need the fallback.  If the pre-chosen path
still fails, the timer RESTARTS before the fallback run so the
recorded time covers one execution only.
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

from pyspark.sql import types as T  # noqa: E402

_ARROW_UNFRIENDLY = (T.ArrayType, T.MapType, T.StructType)


def _wants_collect(df) -> bool:
    """Pick the driver-side materialization path from the schema alone
    (before any execution starts)."""
    return any(isinstance(f.dataType, _ARROW_UNFRIENDLY) for f in df.schema.fields)


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
        try:
            df = fn(spark, sf_dir)
            use_collect = _wants_collect(df)
            t0 = time.time()
            try:
                df.collect() if use_collect else df.toPandas()
            except Exception:
                # unexpected conversion failure: restart the timer so the
                # recorded number covers ONE execution, not two
                t0 = time.time()
                df.collect()
            times[name] = round(time.time() - t0, 3)
            print(f"bench: {name} {times[name]:.2f}s", file=sys.stderr)
        except Exception as exc:  # a failing query must not kill the bench
            times[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    queries_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_queries.json")
    with open(queries_file, "w") as f:
        json.dump({"sf": sf, "total_query_sec": total, "queries": times}, f, indent=1)

    # Line 1: the full driver-contract JSON (metric + per-query map).
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
    sys.stdout.flush()
    # Last line: compact headline — complete even under tail-capture.
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "n_failed": sum(1 for t in times.values() if t < 0),
                "queries_file": "bench_queries.json",
            }
        )
    )


if __name__ == "__main__":
    main()
