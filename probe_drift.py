"""Standalone-warm probe for the r8 bench drift class (r8 VERDICT #5).

The r8 bench regressed +7% sweep-total with most of the delta spread
over queries whose code did not change (min-level moves:
q_source_csv_json_roundtrip x1.74, q_graph_triangles x1.39,
q_jaccard_block x1.29, q_bias_baseline_rmse x1.25, q_market_basket_lift
x1.16, q_item_item_recommend median x1.96).  BUILDLOG attributed the
class to driver-session CPU/GC pressure, but r8's holt root-cause
proved the class can hide real structural costs — so this probe
measures each suspect STANDALONE-warm (fresh session, one query, N
warm runs) for comparison against its in-sweep numbers from
bench_queries.json.  If standalone-warm matches the r7 level while
in-sweep reads high, the cause is sweep-position/session pressure
(environmental); if standalone-warm is also high, the cost is
structural and needs a plan diff.

For q_graph_triangles the probe also A/Bs the r8
persist-vs-localCheckpoint change (SPARK_GRAFT_GRAPH_CHECKPOINT=local
env toggle would need code support; instead we time the shared pair
build directly under both materializations).

Usage: python probe_drift.py [N_RUNS]   (default 4; min + median printed)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SUSPECTS = [
    "q_source_csv_json_roundtrip",
    "q_graph_triangles",
    "q_jaccard_block",
    "q_bias_baseline_rmse",
    "q_market_basket_lift",
    "q_item_item_recommend",
]

# r11: the suspect set is round-specific — override without editing
# (same convention as SPARK_GRAFT_SCALE_QUERIES).
_env_suspects = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
if _env_suspects:
    SUSPECTS = [k.strip() for k in _env_suspects.split(",") if k.strip()]


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import __spark_entry__ as entrymod
    from antidote_data_framework_spark.session import (
        clear_derived_caches,
        get_spark,
    )
    from antidote_data_framework_spark.sources import load_table
    from pyspark.sql import types as T

    arrow_unfriendly = (T.ArrayType, T.MapType, T.StructType)
    spark = get_spark("probe-drift")
    qs = entrymod.queries()
    load_table(spark, SF_DIR, "lineitem").count()  # footer warm-up

    # in-sweep comparison numbers: the committed bench baseline
    bench_path = os.path.join(HERE, "bench_queries.json")
    sweep = {}
    if os.path.exists(bench_path):
        with open(bench_path) as fh:
            sweep = json.load(fh).get("queries", {})

    out = {}
    for name in SUSPECTS:
        walls = []
        for _ in range(n_runs):
            clear_derived_caches(spark)
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if any(
                isinstance(f.dataType, arrow_unfriendly)
                for f in df.schema.fields
            ):
                df.collect()
            else:
                df.toPandas()
            walls.append(time.time() - t0)
        rec = {
            "standalone_min": round(min(walls), 2),
            "standalone_median": round(statistics.median(walls), 2),
            "runs": [round(w, 2) for w in walls],
        }
        s = sweep.get(name)
        if isinstance(s, dict):
            rec["in_sweep"] = {
                k: s[k] for k in ("min", "median") if k in s
            } or s
        elif s is not None:
            rec["in_sweep"] = s
        out[name] = rec
        print(name, json.dumps(rec), flush=True)

    with open(os.path.join(HERE, ".probe_drift.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote .probe_drift.json")


if __name__ == "__main__":
    main()
