"""Document fingerprinting: polynomial rolling hash + winnowing.

The winnowing fingerprint (min rolling hash per sliding window) is the
classic document-fingerprint scheme for plagiarism/dup detection; here a
compact numpy kernel inside an Arrow-batched UDF. Deterministic: fixed
base/modulus, no seeds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

_BASE = np.uint64(1000003)
_WINDOW = 16  # winnowing window (hashes)
_KGRAM = 8    # rolling-hash gram size


def rolling_hashes(blob: bytes, k: int = _KGRAM) -> np.ndarray:
    """64-bit polynomial rolling hashes of every k-gram (mod 2^64)."""
    arr = np.frombuffer(blob, np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n, np.uint64)
        for j in range(k):
            h = h * _BASE + arr[j : j + n]
    return h


def winnow(hashes: np.ndarray, window: int = _WINDOW) -> np.ndarray:
    """Winnowing: the min hash of every sliding window, deduplicated in
    document order — a compact O(n/window) fingerprint."""
    if hashes.size == 0:
        return np.zeros(0, np.uint64)
    if hashes.size <= window:
        return np.array([hashes.min()], dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    mins = sw.min(axis=1)
    keep = np.ones(mins.size, bool)
    keep[1:] = mins[1:] != mins[:-1]
    return mins[keep]


def fingerprint_table(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """-> (key, fingerprint array<long>, n_grams) via mapInPandas."""
    out_schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType, False),
            StructField("fingerprint", ArrayType(LongType(), False), False),
            StructField("n_grams", LongType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, fps, ng = [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                blob = (text or "").encode("utf-8")
                rh = rolling_hashes(blob)
                keys.append(key)
                fps.append(winnow(rh).astype(np.int64).tolist())
                ng.append(rh.size)
            yield pd.DataFrame({key_col: keys, "fingerprint": fps, "n_grams": ng})

    return df.select(key_col, text_col).mapInPandas(compute, out_schema)
