"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns with a
metadata struct — the decode/feature steps run as Arrow-batched
``mapInPandas`` so each executor processes whole record batches. The
actual codec work is STUBBED in this container (no image/audio libraries
are installed): ``decode_stub=True`` (default) produces a deterministic
fake feature vector from the payload bytes, and ``decode_stub=False``
raises NotImplementedError at the exact point a real decoder (PIL/ffmpeg)
would plug in. Everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.

Schema contract:

    media(media_id: long, kind: string,            -- image|audio|video
          payload: binary,
          meta: struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FEATURE_DIM = 16


def synthesize_media_table(
    spark: SparkSession, n: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes), generated
    executor-side via mapInPandas — the same scale path as real ingestion."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                kind = ("image", "audio", "video")[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 4)
                meta = {
                    "width": 64 + (i % 8) * 16 if kind != "audio" else None,
                    "height": 64 + (i % 5) * 16 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 1 + i % 24 if kind == "video" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n, numPartitions=num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """payload → fixed-dim feature vector, one Arrow batch at a time.

    With ``decode_stub`` the "decoder" hashes the payload into a
    deterministic pseudo-feature (so the distributed plumbing — batching,
    schema, downstream joins — is fully exercised); without it, this is
    the marked plug-in point for a real decode + model forward pass.
    """

    def featurize(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires PIL/ffmpeg/torch — not available in "
                    "this container; plug the decoder in here"
                )
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.sha256(bytes(payload)).digest()
                vec = (
                    np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                    .astype(np.float32)
                    / 65535.0
                )
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Image resize over Arrow batches: the normalization step every
    multimodal training pipeline runs before featurization.

    Non-image rows pass through untouched (kind-dispatch inside the batch,
    not a filter+union — one pass over the table). With ``decode_stub``
    the "resize" re-derives a deterministic payload from (payload, target
    dims) and rewrites meta.width/height — schema, batching and the meta
    contract are fully exercised; ``decode_stub=False`` is the marked
    plug-in point for a real decode → resample → re-encode."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")

    def resize(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires PIL/opencv — not available in this "
                    "container; plug the decoder in here"
                )
            is_img = pdf["kind"] == "image"
            payloads, metas = [], []
            for img, payload, meta in zip(is_img, pdf["payload"], pdf["meta"]):
                if img:
                    digest = hashlib.sha256(
                        bytes(payload) + f":{width}x{height}".encode()
                    ).digest()
                    # stub payload sized ∝ target area, as a real re-encode
                    # roughly would be — keeps downstream size accounting real
                    reps = max(1, (width * height) // (64 * 64))
                    payloads.append(digest * reps)
                    m = dict(meta) if meta is not None else {}
                    m["width"], m["height"] = width, height
                    metas.append(m)
                else:
                    payloads.append(payload)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every: int = 8) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame index
    (metadata-driven — JVM-side explode; the per-frame decode would then
    run through :func:`extract_features`)."""
    vids = media.filter(F.col("kind") == "video")
    # zero-frame / metadata-less videos yield no rows instead of crashing
    # on an illegal sequence(0, -1) boundary
    frames = F.when(
        F.col("meta.n_frames") > 0,
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every)),
    ).otherwise(F.array().cast("array<int>"))
    return vids.select("media_id", F.explode(frames).alias("frame_idx"))
