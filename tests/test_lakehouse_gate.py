"""Lakehouse capability gate (r10 VERDICT "what's missing" #4): the
real-format write path has never executed in this jar-less container —
this test makes the gate itself load-bearing TODAY (the unavailable
branch must raise actionable guidance, never ClassNotFoundException
mid-job) and self-activates the real write/read roundtrip on any
cluster where the jars ARE present."""

from __future__ import annotations

import os

import pytest

from antidote_data_framework_spark.sources.lakehouse import (
    _FORMATS,
    lakehouse_available,
    write_lakehouse,
)


@pytest.mark.parametrize("fmt", sorted(_FORMATS))
def test_lakehouse_write_path_gated_or_roundtrips(fmt, spark, sf_dir, tmp_path):
    from antidote_data_framework_spark.sources import load_table

    df = load_table(spark, sf_dir, "region")
    path = os.path.join(str(tmp_path), f"tbl_{fmt}")
    if lakehouse_available(spark, fmt):
        # jar-equipped cluster: the real ACID write path must roundtrip
        write_lakehouse(df, fmt, path, mode="append")
        write_lakehouse(df, fmt, path, mode="append")
        back = spark.read.format(_FORMATS[fmt][0]).load(path)
        assert back.count() == 2 * df.count()
    else:
        # this container: the gate must fail BEFORE the write starts,
        # with setup guidance naming the missing extension class
        with pytest.raises(NotImplementedError) as exc:
            write_lakehouse(df, fmt, path)
        assert _FORMATS[fmt][1] in str(exc.value)
        assert "spark.jars.packages" in str(exc.value)
        assert not os.path.exists(path), "gate must fire before any write"


def test_lakehouse_unknown_format_rejected(spark):
    with pytest.raises(KeyError):
        lakehouse_available(spark, "parquet++")
