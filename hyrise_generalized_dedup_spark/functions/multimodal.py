"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; per-modality decode / feature-extract / resize /
frame-sample are Arrow-batched UDFs over mapInPandas. The decode kernels
are STUBBED in this container (no image/audio libs) behind
`DecodeUnavailable` — everything Spark-side (schema, batch iteration,
partitioning, output contract) is real and tested; swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class DecodeUnavailable(NotImplementedError):
    """Raised by stubbed modality decoders (no codec libs in this image)."""


def decode_image(payload: bytes) -> object:
    raise DecodeUnavailable("image decode requires a codec library (stubbed)")


def decode_audio(payload: bytes) -> object:
    raise DecodeUnavailable("audio decode requires a codec library (stubbed)")


def deterministic_fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real feature extractor: unit-norm
    vector derived from the payload digest. Lets the downstream ANN /
    join / clustering plumbing be exercised for real."""
    digest = hashlib.sha256(payload).digest()
    vals = [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 - 0.5 for i in range(dim)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture: payload =
    utf-8 bytes of text (opaque binary as far as the pipeline cares),
    metadata derived JVM-side."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feat_dim", IntegerType(), False),
        StructField("feat_norm", DoubleType(), False),
        StructField("feat_head", DoubleType(), False),
    ]
)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    Arrow batch path a production decoder would use; features come from
    the deterministic fake (decode_* raise DecodeUnavailable)."""

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # per-item C call (the decoder analog: a real codec is also a
            # per-item native call), then VECTORIZED feature math: all
            # digests packed into one (n, dim) matrix, one normalize pass
            digests = b"".join(
                hashlib.sha256(bytes(p)).digest()[: 4 * 8] for p in pdf["payload"]
            )
            raw = np.frombuffer(digests, dtype=">u4").reshape(len(pdf), 8)
            feats = raw.astype(np.float64) / 2**32 - 0.5
            norms = np.maximum(np.linalg.norm(feats, axis=1), 1e-300)
            unit = feats / norms[:, None]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "n_bytes": pdf["n_bytes"].to_numpy(),
                    "feat_dim": np.full(len(pdf), 8, dtype=np.int32),
                    "feat_norm": np.linalg.norm(unit, axis=1),
                    "feat_head": unit[:, 0],
                }
            )

    return media.select("media_id", "modality", "payload", "n_bytes").mapInPandas(
        run, _FEATURE_SCHEMA
    )
