"""Multimodal column operators — north-star mandated (BASELINE.json:
"multimodal columns" as a first-class component).

Pattern: media is an opaque ``binary`` column + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The container has no image or
audio libraries, so the decoder is a clearly-marked deterministic
stub (STUB_DECODER below) — but every Spark-side contract is real:
schema, partitioning, UDF signature, batch shape, and the
plan around the Python boundary are exactly what a production decode
pipeline uses; swapping in PIL/ffmpeg touches only `_decode_batch`'s
body.

Scale notes: binary payloads ride the scan in Arrow batches; feature
extraction is embarrassingly parallel (no shuffle until the final
aggregate); `spark.sql.files.maxPartitionBytes` bounds batch memory so
a 100 TB media lake streams through fixed-size executor buffers.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table

#: Marks that the real media decoder is stubbed in this environment.
STUB_DECODER = True

FEATURE_DIM = 8


def _decode_batch(payload: bytes) -> list[float]:
    """STUB decode/feature-extract: a real implementation would decode
    the media (PIL / torchaudio / ffmpeg — not in this container) and
    emit pooled features.  The stub derives a deterministic
    FEATURE_DIM-vector from the payload digest so the full pipeline is
    testable end-to-end.  Raises just like a real decoder would on
    empty payloads."""
    if not payload:
        raise NotImplementedError("empty media payload — nothing to decode")
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


@spark_query("q_multimodal_features")  # rows-only: stubbed decoder
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature-extraction pipeline over an opaque binary column.

    The documents fixture stands in for a media lake: text bytes play
    the role of an encoded image/audio payload, with a typed metadata
    struct (modality, n_bytes).  Stages: (1) pack binary + metadata in
    codegen; (2) mapInPandas decode → fixed-width feature vector;
    (3) per-modality aggregate of feature norms — the shape of any
    embed-then-cluster media pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("lang").alias("modality"),
            F.length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )

    out_schema = (
        "media_id BIGINT, modality STRING, n_bytes BIGINT, "
        "features ARRAY<DOUBLE>, feature_norm DOUBLE"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_batch(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats,
                    "feature_norm": [sum(x * x for x in f) ** 0.5 for f in feats],
                }
            )

    features = media.mapInPandas(extract, schema=out_schema)
    return features.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg("feature_norm"), 4).alias("avg_feature_norm"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )


FRAME_STRIDE = 64  # bytes per pseudo-frame in the stub


@spark_query("q_multimodal_framesample")  # rows-only: stubbed decoder
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque media column: one input row →
    N frame rows, each with its own feature vector.

    The stub treats every FRAME_STRIDE-byte slice of the payload as a
    "frame" (a real decoder yields actual video frames / audio chunks
    at a timestamp stride — same contract).  The Spark shape is the
    production one: mapInPandas expands rows (batch in, more rows
    out), frame_idx carries ordering, and downstream per-frame
    features aggregate without ever reassembling the media.  Scale:
    expansion happens inside the scan stage, frames of one asset stay
    in one partition, no shuffle until the final rollup."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )

    out_schema = "media_id BIGINT, frame_idx INT, frame_bytes BIGINT, frame_norm DOUBLE"

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_norm": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, max(len(raw), 1), FRAME_STRIDE):
                    frame = raw[i : i + FRAME_STRIDE]
                    feats = _decode_batch(frame)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i // FRAME_STRIDE)
                    out["frame_bytes"].append(len(frame))
                    out["frame_norm"].append(sum(x * x for x in feats) ** 0.5)
            yield pd.DataFrame(out)

    frames = media.mapInPandas(sample_frames, schema=out_schema)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.round(F.avg("frame_norm"), 4).alias("avg_frame_norm"),
        F.sum("frame_bytes").alias("total_bytes"),
    )
