"""Shared deterministic MinHash machinery (char n-grams or word shingles).

Frozen hash family (seeded), identical across runs and parallelism levels —
the same reproducibility contract as the entity-linking LSH (link.py).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_PRIME = 2_147_483_647


def hash_family(n_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _PRIME, size=n_hashes).astype(np.int64)
    b = rng.randint(0, _PRIME, size=n_hashes).astype(np.int64)
    return a, b


def word_bigrams(text: str) -> set[str]:
    # regexp-word tokens, matching the relational shingles (dedup.py) and
    # the DuckDB oracle exactly
    words = re.findall(r"[a-z]+", text)
    if len(words) < 2:
        return set(words)
    return {words[i] + " " + words[i + 1] for i in range(len(words) - 1)}


def signature(tokens: set[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    vals = np.array([zlib.crc32(t.encode()) for t in tokens], dtype=np.int64)
    if len(vals) == 0:
        vals = np.array([0], dtype=np.int64)
    return ((np.outer(a, vals) + b[:, None]) % _PRIME).min(axis=1)


def band_rows_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    n_bands: int = 32,
    seed: int = 7,
) -> DataFrame:
    """(id, band, band_key) rows from word-bigram MinHash signatures.

    mapInPandas — Arrow-batched, no per-row Python at the Spark layer; the
    per-document tokenization inside the batch is the unavoidable Python
    text work, identical in shape to the reference's per-document parsers.
    """
    a, b = hash_family(n_hashes, seed)
    rows_per_band = n_hashes // n_bands
    schema = f"{id_col} long, band int, band_key long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sig = signature(word_bigrams(text), a, b)
                for band in range(n_bands):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    key = zlib.crc32("|".join(map(str, chunk)).encode())
                    out.append((did, band, int(key)))
            yield pd.DataFrame(out, columns=[id_col, "band", "band_key"])

    return df.select(id_col, text_col).mapInPandas(gen, schema)
