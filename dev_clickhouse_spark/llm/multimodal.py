"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages.  The decode libraries (PIL/torchaudio/ffmpeg) are NOT
in this container, so the actual decode is STUBBED behind
``NotImplementedError`` with a deterministic fake — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested, and swapping the stub
for a real decoder changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),          # opaque encoded bytes
    T.StructField("meta", T.StructType([               # typed sidecar metadata
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def real_decode(payload: bytes, media_type: str):
    """The real decoder hook — image decode/resize, audio resample, video
    frame-sample.  Requires PIL / torchaudio / av, which are not installed
    here."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "environment; extract_features uses the deterministic stub"
    )


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake features standing in for the decoded-content
    embedding: [byte length, first byte, last byte, byte-sum mod 997]."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def attach_media(docs: DataFrame) -> DataFrame:
    """Demo adapter: wrap document text bytes as an opaque media payload with
    typed metadata — the shape a parquet table of encoded images would have."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.  Partition-local
    and map-only: at 100 TB this is the GPU/CPU-bound stage you scale by
    executor count, not by shuffle tuning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    feats.append(real_decode(raw, mtype))
                else:
                    feats.append(_stub_features(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(p) if p is not None else b"") for p in pdf["payload"]],
                "features": feats,
            })

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_payload", T.BinaryType()),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224,
    use_real_decode: bool = False,
) -> DataFrame:
    """Image resize stage (stubbed decode): real path would decode → resize →
    re-encode via PIL; the stub emits a deterministic byte slice standing in
    for the resized encoding, with the target dimensions in typed columns.
    Row-preserving map-only stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    real_decode(raw, "image")
                # deterministic fake: clamp byte length to width*height/64
                out_payloads.append(raw[: max(1, (width * height) // 64)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out_payloads,
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
            })

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, use_real_decode: bool = False,
) -> DataFrame:
    """Video frame sampling (stubbed decode): one input row fans out to
    ``n_frames`` rows — the batch-shape change a real ffmpeg sampler
    produces.  The stub slices the payload into equal chunks as fake
    frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    real_decode(raw, "video")
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    rows.append((mid, i, raw[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_payload"]
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


@register("multimodal_feature_extract", tags=["llm-multimodal"])  # rows-only
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: wrap → mapInPandas feature extract →
    per-source aggregate.  Decode is stubbed (no media libs in container);
    driver records a rows-only check."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    feats = extract_features(media)
    meta = media.select("media_id", F.col("meta.source").alias("source"))
    return (
        feats.join(meta, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            rnd(F.avg(F.element_at("features", 4)), 4).alias("avg_checksum_feature"),
        )
    )
