"""Timestamp-flavor robustness (r3 ADVICE): the loader must normalize
every parquet encoding of events.ts the driver has shipped — NANOS
(read as bigint under nanosAsLong), plain microseconds (TIMESTAMP_NTZ)
— plus the documented tz-annotated pass-through, and DuckDB-oracle
parity must hold for each.  Until this file, the tz-annotated flavor
was an untested claim.

Also pins session-timezone independence: the loaded instants must not
change if the session timezone is mutated AFTER the plan is built
(the NTZ conversion is arithmetic, not a tz-consulting cast).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import TABLES, load_table
from oracle_check import canon_rows

SF = "/root/testdata/sf0.001"

FLAVORS = {
    "ntz_us": None,  # the fixture's own encoding — staged unchanged
    "tz_utc": pa.timestamp("us", tz="UTC"),
    "nanos": pa.timestamp("ns"),
}


def _stage_flavor(dst_dir: str, flavor: str) -> str:
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = f"{SF}/{t}.parquet"
        dst = f"{dst_dir}/{t}.parquet"
        ts_type = FLAVORS[flavor]
        if t == "events" and ts_type is not None:
            tbl = pq.read_table(src)
            idx = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(idx, "ts", tbl["ts"].cast(ts_type))
            # version 2.6 keeps NANOS physical annotation instead of
            # silently coercing back to micros
            pq.write_table(tbl, dst, version="2.6")
        else:
            shutil.copyfile(src, dst)
    return dst_dir


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_tumbling_window_oracle_parity_per_flavor(flavor, spark, tmp_path):
    sf_dir = _stage_flavor(str(tmp_path / flavor), flavor)
    sdf = entrymod.queries()["q_window_tumbling"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    ddf = con.execute(entrymod.oracle_sql()["q_window_tumbling"]).fetchdf()
    con.close()
    assert canon_rows(sdf) == canon_rows(ddf), f"flavor {flavor} diverges"


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_loaded_instants_survive_session_tz_mutation(flavor, spark, tmp_path):
    """Build the plan under UTC, evaluate under America/New_York: the
    instant-level aggregate must not move (r3 ADVICE: a lazy cast
    would consult the mutated timezone at action time)."""
    sf_dir = _stage_flavor(str(tmp_path / flavor), flavor)
    probe = load_table(spark, sf_dir, "events").agg(
        F.sum(F.unix_micros("ts")).alias("s"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    base = probe.first()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        shifted = probe.first()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert (base.s, base.lo, base.hi) == (shifted.s, shifted.lo, shifted.hi)


@pytest.mark.parametrize("chunk_size", [7, 64, 100_000])
def test_holt_chunked_partial_fold_is_bit_identical(spark, sf_dir, chunk_size):
    """r5 VERDICT #6: the chunked carry-fold must equal the
    single-pass fold EXACTLY (same fixed-order IEEE loop; a chunk
    boundary only pauses it).  chunk_size=7 forces many passes,
    64 a few, 100_000 exactly one — all three must match row for
    row, including the carried n_events."""
    from antidote_data_framework_spark.operators.timeseries import (
        holt_linear_chunked,
    )

    import __spark_entry__ as entrymod

    base = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast_1"])
        for r in entrymod.queries()["q_holt_linear"](spark, sf_dir).collect()
    }
    chunked = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast_1"])
        for r in holt_linear_chunked(spark, sf_dir, chunk_size=chunk_size).collect()
    }
    assert chunked == base


def test_ewma_chunked_batch_equals_streaming_state_machine(spark, sf_dir):
    """The generic chunked carry-fold must reproduce the streaming
    stateful EWMA exactly: same float ops in the same per-user event
    order, so batch-chunked finals == streaming finals bit for bit
    (compared at the stream's emitted 4-dp rounding)."""
    from antidote_data_framework_spark.operators.timeseries import (
        ewma_recurrence_chunked,
    )

    import __spark_entry__ as entrymod

    streamed = {
        r["user_id"]: (r["n_events"], r["ewma_cents"])
        for r in entrymod.queries()["q_stream_ewma_stateful"](spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], round(r["ewma_cents"], 4))
        for r in ewma_recurrence_chunked(spark, sf_dir, chunk_size=13).collect()
    }
    assert batch == streamed
