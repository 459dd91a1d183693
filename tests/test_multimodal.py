"""Multimodal pipeline tests: the WAV payloads are REAL RIFF
containers (stdlib ``wave`` both writes and parses them), and the
Spark plumbing (mapInPandas expansion, per-asset rollups) preserves
exact sample counts."""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as entrymod
from antidote_data_framework_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_SAMPLES,
    SAMPLE_RATE,
    _decode_wav,
    _encode_wav,
    _features,
)


def test_wav_roundtrip_is_a_real_container():
    raw = bytes(range(256))
    payload = _encode_wav(raw)
    # a genuine RIFF/WAVE header, not a digest stub
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    samples, rate = _decode_wav(payload)
    assert rate == SAMPLE_RATE
    assert samples.shape == (256,)
    # 8-bit PCM scaling: byte b -> (b - 128) / 128
    np.testing.assert_allclose(samples, (np.arange(256) - 128.0) / 128.0)


def test_decode_rejects_non_wav_bytes():
    with pytest.raises(Exception):
        _decode_wav(b"not a wav container at all")


def test_features_shape_and_known_values():
    # constant stream at byte 128 -> all samples 0: rms 0, zcr 0, peak 0,
    # histogram mass all in the middle bin
    feats = _features(_decode_wav(_encode_wav(b"\x80" * 100))[0])
    assert len(feats) == FEATURE_DIM
    rms, zcr, peak = feats[0], feats[1], feats[2]
    assert rms == 0.0 and zcr == 0.0 and peak == 0.0
    assert feats[3 + 2] == 1.0  # middle histogram bin

    # alternating extremes -> zcr 1, peak 1
    alt = _decode_wav(_encode_wav(b"\x00\xff" * 50))[0]
    feats = _features(alt)
    assert feats[1] == 1.0 and feats[2] == 1.0


def test_framesample_conserves_samples(spark, sf_dir):
    """Per-asset total_samples must equal the exact payload sample
    count, and n_frames the ceil-division by the frame stride — the
    decode→frame→rollup path loses nothing."""
    from antidote_data_framework_spark.sources import load_table
    from pyspark.sql import functions as F

    out = entrymod.queries()["q_multimodal_framesample"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    joined = out.join(docs, "media_id").withColumn(
        "expect_frames",
        F.greatest(F.ceil(F.col("n_bytes") / FRAME_SAMPLES), F.lit(1)).cast("long"),
    )
    bad = joined.filter(
        (F.col("total_samples") != F.col("n_bytes"))
        | (F.col("n_frames") != F.col("expect_frames"))
    )
    assert bad.count() == 0
    assert out.count() == docs.count()


def test_features_query_runs_per_modality(spark, sf_dir):
    out = entrymod.queries()["q_multimodal_features"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert set(out.columns) == {"modality", "n_media", "avg_feature_norm", "avg_bytes"}
    assert (out["n_media"] > 0).all()
