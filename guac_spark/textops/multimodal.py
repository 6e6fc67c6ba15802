"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
mapInPandas stages.

Decode coverage in this container (no PIL/ffmpeg/torchaudio):
  * UNCOMPRESSED formats decode FOR REAL with stdlib+numpy only —
    PCM WAV (RIFF chunk walk -> int16 frames -> rms/peak/duration) and
    binary PPM P6 (header parse -> HxWx3 array -> channel means +
    nearest-neighbor resize). See decode_wav_features /
    decode_ppm_features below; fixtures synth_wav/synth_ppm are
    deterministic byte-level generators.
  * COMPRESSED formats (JPEG/PNG/MP4/Opus) remain stubbed:
    `decode_stub=True` (default) produces a deterministic fake feature
    vector from the payload bytes so the Spark-side plumbing — schema,
    batching, partitioning, UDF signatures — is real and testable; with
    `decode_stub=False` the stage raises NotImplementedError at the exact
    point a real codec would plug in.
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


# --- real decoders for uncompressed formats (stdlib + numpy only) ----------

def synth_wav(freq_hz: float, n_samples: int, rate: int = 8000,
              amplitude: float = 0.5) -> bytes:
    """Deterministic 16-bit PCM mono WAV bytes (a pure-stdlib fixture
    generator — the byte-level truth the decoder is tested against)."""
    import struct

    t = np.arange(n_samples, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * freq_hz * t) * amplitude * 32767).astype(
        "<i2"
    )
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return out


def parse_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int16 samples) from RIFF/WAVE bytes —
    a REAL decode: chunk walk, PCM-format check, frame reinterpret.
    Raises ValueError on non-PCM or malformed payloads (callers route
    those to the compressed-format stub path)."""
    import struct

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_code != 1:
                raise ValueError(f"non-PCM wav (format {fmt_code})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got {bits}")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, channels, samples


def decode_wav_features(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_channels, n_samples, duration_ms, rms,
    peak) — REAL audio decode + feature extraction over Arrow batches.
    One numpy pass per payload; no per-sample Python."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, s = parse_wav(bytes(payload))
                x = s.astype(np.float64) / 32768.0
                n = len(s) // ch
                rows.append((
                    mid, rate, ch, n, int(n * 1000 / rate),
                    float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                    float(np.max(np.abs(x))) if len(x) else 0.0,
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_channels",
                         "n_samples", "duration_ms", "rms", "peak"],
            )

    return media.select("media_id", "payload").mapInPandas(
        gen,
        "media_id long, sample_rate int, n_channels int, n_samples long, "
        "duration_ms long, rms double, peak double",
    )


def synth_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM (P6) bytes: a gradient + seed-offset
    pattern, computed not random — byte-level reproducible."""
    y, x = np.mgrid[0:height, 0:width]
    r = ((x * 7 + seed) % 256).astype(np.uint8)
    g = ((y * 11 + seed * 3) % 256).astype(np.uint8)
    b = (((x + y) * 5 + seed * 7) % 256).astype(np.uint8)
    arr = np.stack([r, g, b], axis=-1)
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


def parse_ppm(b: bytes) -> np.ndarray:
    """HxWx3 uint8 array from binary PPM (P6) bytes — a REAL image
    decode (header tokenizer incl. '#' comments + raster reinterpret)."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 ppm payload")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c == b"#":
            pos = b.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(b) and not b[end : end + 1].isspace():
                end += 1
            tokens.append(int(b[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = b[pos + 1 : pos + 1 + w * h * 3]
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure numpy index gather."""
    h0, w0 = arr.shape[:2]
    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    return arr[yi][:, xi]


def decode_ppm_features(
    media: DataFrame, resize_to: tuple[int, int] | None = None
) -> DataFrame:
    """(media_id, width, height, mean_r, mean_g, mean_b [, thumb]) — REAL
    image decode + per-channel means; resize_to=(w, h) additionally emits
    a nearest-neighbor thumbnail re-encoded as PPM bytes (the
    decode→transform→re-encode roundtrip a training-data image pipeline
    runs per record)."""
    cols = ["media_id", "width", "height", "mean_r", "mean_g", "mean_b"]
    schema = ("media_id long, width int, height int, "
              "mean_r double, mean_g double, mean_b double")
    if resize_to:
        cols.append("thumb")
        schema += ", thumb binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = parse_ppm(bytes(payload))
                h, w = arr.shape[:2]
                means = arr.reshape(-1, 3).mean(axis=0)
                row = [mid, w, h, float(means[0]), float(means[1]),
                       float(means[2])]
                if resize_to:
                    tw, th = resize_to
                    thumb = resize_nearest(arr, tw, th)
                    row.append(
                        f"P6\n{tw} {th}\n255\n".encode() + thumb.tobytes()
                    )
                rows.append(tuple(row))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(gen, schema)
