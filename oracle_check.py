"""Local mirror of the driver's DuckDB-oracle verify.

Runs every registered query through Spark AND its oracle SQL through
DuckDB on the same parquet fixtures, then compares row count, column
names, and an order-insensitive canonical row multiset.  Queries with
no oracle get a rows-only check (runs + row count >= 0).

Usage:
    python oracle_check.py                      # all queries at sf0.001
    python oracle_check.py --sf /root/testdata/sf0.01 q_agg_pricing_summary ...
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from antidote_data_framework_spark.session import get_spark
from antidote_data_framework_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(f)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        if pd.isna(v):
            return "NULL"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return cols, rows


def compare_one(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> tuple[bool, str]:
    t0 = time.time()
    sdf = fn(spark, sf_dir).toPandas()
    spark_s = time.time() - t0
    if sql is None:
        return True, f"rows-only ok ({len(sdf)} rows, {spark_s:.1f}s)"
    ddf = con.execute(sql).fetchdf()
    scols, srows = canon_rows(sdf)
    dcols, drows = canon_rows(ddf)
    if scols != dcols:
        return False, f"COLUMN MISMATCH spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return False, f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    if srows != drows:
        diffs = [
            (s, d) for s, d in zip(srows, drows) if s != d
        ][:5]
        detail = "\n".join(f"    spark={s}\n    duck ={d}" for s, d in diffs)
        return False, f"VALUE MISMATCH ({len(diffs)}+ rows differ):\n{detail}"
    return True, f"hash-match ok ({len(srows)} rows, {spark_s:.1f}s)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query keys (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("oracle_check")
    con = duck_connect(args.sf)
    failed = []
    for name in names:
        try:
            ok, msg = compare_one(spark, con, name, qs[name], oracles.get(name), args.sf)
        except Exception:
            ok, msg = False, "EXCEPTION\n" + traceback.format_exc(limit=8)
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed at {args.sf}")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
