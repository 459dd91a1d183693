"""Regenerate tests/rows_only_golden.json — the local verdict for
every registered query key that has NO oracle SQL (r3 VERDICT item:
rows-only keys live outside the driver's 50-slot verify window, and
r2 proved they can silently break; this golden pins their schema and
a minimum row count at sf0.001 so tests/test_oracle_parity.py gives
each one a real local verdict).

Run after intentionally changing a rows-only query's output shape:
    python gen_rows_only_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from antidote_data_framework_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "rows_only_golden.json")


def main() -> None:
    spark = get_spark("gen_rows_only_golden")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    golden: dict[str, dict] = {}
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = fn(spark, SF_DIR)
        schema = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
        n = df.count()
        # min_rows pins non-emptiness where sf0.001 legitimately yields
        # rows; pair-finding ops may honestly find nothing at this SF.
        golden[name] = {"schema": schema, "min_rows": 1 if n > 0 else 0, "rows_at_gen": n}
        print(f"{name}: rows={n} schema={schema}", file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {OUT} ({len(golden)} rows-only keys)")


if __name__ == "__main__":
    main()
