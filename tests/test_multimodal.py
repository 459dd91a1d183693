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
    IMG_WIDTH,
    SAMPLE_RATE,
    _decode_bmp,
    _decode_wav,
    _encode_bmp,
    _encode_wav,
    _features,
    _image_features,
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


def test_bmp_roundtrip_is_a_real_container():
    """Pixels survive the full container round-trip: header geometry,
    palette offset, bottom-up row order, and 4-byte row padding are
    all honored (width 64 is already 4-aligned, so also try width 6
    where stride padding actually bites)."""
    raw = bytes(range(256))
    payload = _encode_bmp(raw)
    assert payload[:2] == b"BM"
    img = _decode_bmp(payload)
    assert img.shape == (256 // IMG_WIDTH, IMG_WIDTH)
    np.testing.assert_allclose(img.ravel(), np.arange(256) / 255.0)

    img6 = _decode_bmp(_encode_bmp(bytes(range(18)), width=6))
    assert img6.shape == (3, 6)
    np.testing.assert_allclose(img6.ravel(), np.arange(18) / 255.0)


def test_bmp_decode_rejects_non_bmp_bytes():
    with pytest.raises(Exception):
        _decode_bmp(b"PNG-ish bytes that are not a BMP")
    # a real WAV payload is also not a BMP
    with pytest.raises(Exception):
        _decode_bmp(_encode_wav(b"\x00" * 64))


def test_image_features_shape_and_known_values():
    # constant black image: mean 0, std 0, gradient 0, all mass in bin 0
    feats = _image_features(_decode_bmp(_encode_bmp(b"\x00" * 128)))
    assert len(feats) == FEATURE_DIM
    assert feats[0] == 0.0 and feats[1] == 0.0 and feats[2] == 0.0
    assert feats[3] == 1.0

    # alternating black/white columns: max gradient, split histogram
    alt = _image_features(_decode_bmp(_encode_bmp(b"\x00\xff" * 64)))
    assert alt[2] == 1.0  # every horizontal step is a full-range edge
    assert abs(alt[3] - 0.5) < 1e-12 and abs(alt[7] - 0.5) < 1e-12


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


def test_dhash_stability_and_sensitivity():
    """Identical pixels -> identical hash; one flipped block changes
    few bits (locality — the property banding relies on)."""
    from antidote_data_framework_spark.operators.multimodal import _dhash

    base = bytes(range(256)) * 4
    h1 = _dhash(_decode_bmp(_encode_bmp(base)))
    h2 = _dhash(_decode_bmp(_encode_bmp(base)))
    assert h1 == h2
    # flip a single byte far from most block boundaries
    mutated = bytearray(base)
    mutated[100] = 255 - mutated[100]
    h3 = _dhash(_decode_bmp(_encode_bmp(bytes(mutated))))
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") <= 8
    # short image (fewer than 8 pixel rows) is still well-defined
    assert isinstance(_dhash(_decode_bmp(_encode_bmp(b"abcdef" * 10))), int)


def test_image_phash_neardup_pairs_verified(spark, sf_dir):
    """Every emitted pair must satisfy the hamming gate, be ordered,
    and be unique; the fixture is known to contain phash near-dups."""
    from antidote_data_framework_spark.operators.multimodal import PHASH_MAX_HAMMING

    rows = entrymod.queries()["q_image_phash_neardup"](spark, sf_dir).collect()
    assert len(rows) > 0
    seen = set()
    for r in rows:
        assert r["media_a"] < r["media_b"]
        assert 0 <= r["hamming"] <= PHASH_MAX_HAMMING
        assert (r["media_a"], r["media_b"]) not in seen
        seen.add((r["media_a"], r["media_b"]))


def test_avi_roundtrip_is_a_real_container():
    """Frames survive the full RIFF/AVI mux-demux round-trip: chunk
    walking, avih geometry, bottom-up DIB rows, stride padding, and
    even-size chunk padding all honored."""
    from antidote_data_framework_spark.operators.multimodal import (
        VID_H,
        VID_W,
        _decode_avi,
        _encode_avi,
    )

    raw = bytes(range(256)) + bytes(range(64))  # 2.5 frames -> 3 frames
    payload = _encode_avi(raw)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert b"movi" in payload and b"idx1" in payload and b"00db" in payload
    frames = _decode_avi(payload)
    assert len(frames) == 3
    assert all(f.shape == (VID_H, VID_W) for f in frames)
    flat = np.concatenate([f.ravel() for f in frames]) * 255.0
    expect = np.frombuffer(raw + b"\x00" * (3 * VID_W * VID_H - len(raw)), dtype=np.uint8)
    np.testing.assert_allclose(flat, expect.astype(np.float64))


def test_avi_decode_rejects_non_avi_bytes():
    from antidote_data_framework_spark.operators.multimodal import (
        _decode_avi,
        _encode_wav,
    )

    with pytest.raises(Exception):
        _decode_avi(b"not an avi at all, definitely")
    with pytest.raises(Exception):
        _decode_avi(_encode_wav(b"\x00" * 64))  # RIFF but WAVE, not AVI


def test_video_framesample_conserves_frames(spark, sf_dir):
    """n_frames_total must equal ceil(n_bytes / frame_px) per video,
    and the sampled count the ceil-half of that."""
    from antidote_data_framework_spark.operators.multimodal import VID_H, VID_W
    from antidote_data_framework_spark.sources import load_table
    from pyspark.sql import functions as F

    out = entrymod.queries()["q_video_framesample"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    joined = out.join(docs, "media_id").withColumn(
        "expect_frames",
        F.greatest(F.ceil(F.col("n_bytes") / (VID_W * VID_H)), F.lit(1)).cast("int"),
    )
    bad = joined.filter(
        (F.col("n_frames_total") != F.col("expect_frames"))
        | (F.col("n_frames_sampled") != F.ceil(F.col("n_frames_total") / 2))
    )
    assert bad.count() == 0
    assert out.count() == docs.count()
