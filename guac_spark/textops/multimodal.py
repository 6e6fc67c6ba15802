"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
mapInPandas stages. The decode step itself is STUBBED in this container
(no image/audio libraries): `decode_stub=True` (default) produces a
deterministic fake feature vector from the payload bytes so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
testable; with `decode_stub=False` the stage raises NotImplementedError at
the exact point a real decoder (PIL/ffmpeg/torchaudio) would plug in.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 16


def attach_media(docs: DataFrame) -> DataFrame:
    """Demo media table: wraps document text bytes as an opaque payload
    (what a real pipeline gets from an object store's binaryFile source)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("doc_id") % 640).cast("int").alias("width"),
            (F.col("doc_id") % 480).cast("int").alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    # deterministic stand-in for a real decoder+encoder: seed from content
    seed = zlib.crc32(hashlib.sha256(payload).digest())
    rng = np.random.RandomState(seed % (2**31))
    return rng.normal(size=dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode_stub: bool = True
) -> DataFrame:
    """(media_id, kind, n_bytes, features array<float>).

    The real decode would happen where `_fake_features` is called — one
    Arrow batch of payloads in, one batch of feature vectors out; that
    batch shape (not per-row calls) is what makes this viable at scale.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; plug the decoder in here"
                )
            feats = [
                _fake_features(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen,
        "media_id long, kind string, n_bytes long, features array<float>",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Relational frame-sampling plan: one row per (media_id, frame_ts_ms)
    for video payloads — the explode happens BEFORE decode so Spark can
    repartition decode work at frame granularity (the 100 TB-friendly
    shape: decode parallelism is not bounded by file count)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("dur")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("dur"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
