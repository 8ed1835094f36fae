"""Multimodal plumbing: real byte-level features + the gated image
decode stub (schemas, Arrow batch shape, partitioning)."""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_wikipedia_spark.operators import multimodal as mm


def _media(spark, payloads):
    rows = [
        (i, "blob", p, None, None, None) for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_byte_features_hand_values(spark):
    media = _media(spark, [b"aabb", b"", b"\x00\xff", b"abcd"])
    got = {r["doc_id"]: r for r in mm.byte_features(media).collect()}
    assert len(got) == 4
    # "aabb": 2 symbols, p=0.5 each → entropy 1.0
    assert got[0]["n_bytes"] == 4
    assert abs(got[0]["entropy"] - 1.0) < 1e-9
    assert abs(got[0]["mean_byte"] - (97 * 2 + 98 * 2) / 4) < 1e-9
    assert got[0]["printable_ratio"] == 1.0
    # empty payload → all-zero features
    assert got[1]["n_bytes"] == 0 and got[1]["entropy"] == 0.0
    # non-printable bytes
    assert got[2]["printable_ratio"] == 0.0
    assert abs(got[2]["mean_byte"] - 127.5) < 1e-9
    # 4 distinct symbols → entropy 2.0
    assert abs(got[3]["entropy"] - 2.0) < 1e-9


def test_byte_features_entropy_range(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    payloads = [bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
                for _ in range(3)]
    rows = mm.byte_features(_media(spark, payloads)).collect()
    for r in rows:  # near-uniform bytes → entropy close to 8 bits
        assert 7.5 < r["entropy"] <= 8.0
        assert 0 <= r["printable_ratio"] <= 1


def test_decode_stub_is_gated(spark):
    media = _media(spark, [b"payload"])
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        mm.extract_features(media, deterministic_stub=False).collect()


def test_extract_features_stub_shape(spark):
    media = _media(spark, [b"x" * 10, b"y" * 20])
    rows = mm.extract_features(media, deterministic_stub=True).collect()
    assert {r["doc_id"] for r in rows} == {0, 1}
    for r in rows:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] in (10, 20)
