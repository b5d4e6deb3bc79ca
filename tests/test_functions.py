"""Text / fingerprint / multimodal function tests (pure-oracle layer)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.functions import text as T
from hyrise_generalized_dedup_spark.functions.fingerprint import (
    fingerprint_table,
    rolling_hashes,
    winnow,
)
from hyrise_generalized_dedup_spark.functions.multimodal import (
    DecodeUnavailable,
    decode_image,
    deterministic_fake_features,
    extract_features,
    media_table_from_documents,
)


def test_text_features_edge_cases(spark):
    rows = [
        (1, ""),
        (2, "   "),
        (3, "the quick and lazy dog of doom"),
        (4, "der hund und die katze nicht hier"),
        (5, "12345 !!!"),
        (6, "une seule ligne avec le chat et les chiens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            T.token_count(F.col("text")).alias("tok"),
            T.alpha_ratio(F.col("text")).alias("alpha"),
            T.punct_ratio(F.col("text")).alias("punct"),
            T.stopword_ratio(F.col("text")).alias("stop"),
            T.quality_score(F.col("text")).alias("q"),
            T.lang_guess(F.col("text")).alias("lang"),
        ).collect()
    }
    assert out[1].tok == 0 and out[2].tok == 0
    assert out[3].tok == 7
    assert out[1].alpha == 0.0
    assert out[5].punct > 0.2 and out[5].alpha == 0.0
    assert out[3].stop == 3 / 7  # the, and, of
    assert out[3].lang == "en" and out[4].lang == "de" and out[6].lang == "fr"
    assert out[1].q <= 0.5 < out[3].q


def test_winnow_matches_naive():
    rng = np.random.default_rng(3)
    blob = bytes(rng.integers(32, 127, 400, dtype=np.uint8))
    rh = rolling_hashes(blob)
    fp = winnow(rh, window=16)
    # naive: min of each window, dedup consecutive
    naive = []
    for i in range(len(rh) - 16 + 1):
        m = rh[i : i + 16].min()
        if not naive or naive[-1] != m:
            naive.append(m)
    assert fp.tolist() == naive


def test_fingerprint_detects_shared_content(spark):
    shared = "int main() { return process(argc, argv); }\n" * 8
    rows = [(1, "prefix-A " * 10 + shared), (2, "prefix-B " * 12 + shared), (3, "nothing in common here at all " * 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: set(r.fingerprint) for r in fingerprint_table(df).collect()}
    overlap_12 = len(fps[1] & fps[2]) / min(len(fps[1]), len(fps[2]))
    overlap_13 = len(fps[1] & fps[3]) / min(len(fps[1]), len(fps[3]))
    assert overlap_12 > 0.3 > overlap_13


def test_multimodal_stub_and_plumbing(spark):
    import pytest as _pytest

    with _pytest.raises(DecodeUnavailable):
        decode_image(b"\x89PNG")
    f1 = deterministic_fake_features(b"payload")
    assert f1 == deterministic_fake_features(b"payload")
    assert abs(sum(v * v for v in f1) - 1.0) < 1e-9

    docs = spark.createDataFrame(
        [(i, f"content-{i % 4}") for i in range(12)], "doc_id long, text string"
    )
    media = media_table_from_documents(docs.withColumn("text", F.col("text")))
    feats = extract_features(media).collect()
    assert len(feats) == 12
    by_id = {r.media_id: r for r in feats}
    # identical payloads -> identical features regardless of partition
    assert by_id[0].feat_head == by_id[4].feat_head == by_id[8].feat_head
    assert all(abs(r.feat_norm - 1.0) < 1e-9 for r in feats)
    assert {r.modality for r in feats} == {"image", "audio", "video"}
