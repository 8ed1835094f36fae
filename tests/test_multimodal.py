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


class _FakeImage:
    """Stands in for a PIL.Image: content-derived pixels so the decode
    feature is deterministic per payload."""

    def __init__(self, payload):
        self._seed = sum(payload) % 251 if payload else 0
        self.size = (64, 32)
        if not payload or payload[:1] != b"\x89":  # "magic byte" check
            raise OSError("cannot identify image file")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode):
        assert mode == "RGB"
        return self

    def resize(self, wh):
        assert wh == (mm.THUMB_SIDE, mm.THUMB_SIDE)
        return self

    def __array__(self, dtype=None):
        import numpy as np

        a = np.full((mm.THUMB_SIDE, mm.THUMB_SIDE, 3), self._seed,
                    dtype="uint8")
        return a.astype(dtype) if dtype is not None else a


class _FakeImageModule:
    @staticmethod
    def open(bio):
        return _FakeImage(bio.read())


def test_pil_decode_path_plumbing(monkeypatch):
    """Exercise the REAL decode path with a stand-in PIL module: the
    feature layout (3 channel means + 3 stds + log-dims), the
    undecodable-payload zero-vector fallback, and determinism.  The
    Spark-side mapInPandas plumbing is covered by the stub tests; this
    pins the kernel a real Pillow install would run."""
    import numpy as np
    import pandas as pd

    monkeypatch.setattr(mm, "_pil_image_module",
                        lambda: _FakeImageModule)
    feats = mm.decode_image_batch(
        pd.Series([b"\x89good", b"junk", None, b"\x89good"]))
    f0, f_bad, f_none, f_dup = (np.asarray(f) for f in feats)
    assert f0.shape == (mm.FEATURE_DIM,) and f0.dtype == np.float32
    seed = sum(b"\x89good") % 251
    assert np.allclose(f0[:3], seed / 255.0)     # channel means
    assert np.allclose(f0[3:6], 0.0, atol=1e-5)  # constant image: std 0
    assert np.allclose(
        f0[6:], [math.log1p(64) / 10, math.log1p(32) / 10], atol=1e-6)
    # undecodable / empty payloads -> zero vector, not a task failure
    assert not f_bad.any() and not f_none.any()
    assert np.array_equal(f0, f_dup)  # deterministic per payload


def test_pil_decode_real_pillow_if_present(spark):
    """Self-healing contract: when Pillow exists (off-sandbox), the
    full Spark pipeline decodes a real PNG end-to-end."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("RGB", (8, 4), color=(255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    rows = mm.extract_features(_media(spark, [buf.getvalue()])).collect()
    assert len(rows) == 1
    feat = rows[0]["feature"]
    assert len(feat) == mm.FEATURE_DIM
    assert feat[0] == pytest.approx(1.0)   # pure red: mean R == 1
    assert feat[1] == pytest.approx(0.0)
