"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The ``pages`` input already carries one multimodal column —
``html: binary`` — and a 100 TB training-data pipeline adds image /
audio / video payloads with the same shape: an opaque ``binary`` column
plus typed metadata, processed by Arrow-batched kernels.

This module makes the **Spark-side plumbing real** (schemas,
``mapInPandas`` batch shape, partition-size control) while the actual
codec calls are stubbed: the sandbox has no image/audio libraries, so
``decode_image_batch`` raises ``NotImplementedError`` unless
``deterministic_stub=True``, in which case a seeded, content-derived
fake (md5-based) stands in — making the full pipeline testable and the
UDF signatures/battch contracts exercisable.

Scale notes: binary payload rows are large and skew-prone — the
pipeline repartitions by a payload-size-aware key before the decode
stage so one Arrow batch never exceeds executor memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` is the second
guard), and metadata-only queries never touch the payload column
(column pruning keeps ``binary`` out of the scan).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)
FEATURE_SCHEMA = "doc_id long, media_type string, feature array<float>, n_bytes int"
FEATURE_DIM = 8
BYTE_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, entropy double, "
    "mean_byte double, printable_ratio double"
)


def attach_media_metadata(pages: DataFrame) -> DataFrame:
    """pages(html binary, …) → media rows with typed metadata.

    Metadata derives from the payload natively (length, magic-byte
    sniff) — no UDF, stays in codegen; the payload itself is carried
    opaque.
    """
    payload = F.col("html")
    return pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.when(
            F.substring(payload, 1, 5) == F.lit(b"<!DOC"), F.lit("html")
        ).otherwise(F.lit("binary")).alias("media_type"),
        payload.alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _byte_feature_row(payload: bytes) -> tuple[int, float, float, float]:
    """(n_bytes, shannon_entropy, mean_byte, printable_ratio) of one
    payload — pure numpy over the byte histogram; entropy sums bins in
    ascending byte order (matching the SQL oracle's grouped sum)."""
    b = np.frombuffer(payload or b"", dtype=np.uint8)
    n = b.size
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    counts = np.bincount(b, minlength=256).astype(np.float64)
    probs = counts[counts > 0] / n
    entropy = float(-(probs * np.log2(probs)).sum())
    mean_byte = float(b.sum(dtype=np.float64) / n)
    printable = float(((b >= 32) & (b < 127)).sum() / n)
    return n, entropy, mean_byte, printable


def byte_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """media → (doc_id, media_type, n_bytes, entropy, mean_byte,
    printable_ratio): REAL, dependency-free per-payload features.

    The codec-free half of multimodal feature extraction — byte
    histogram statistics (Shannon entropy, mean byte value, printable
    density) computed in an Arrow-batched numpy kernel.  Useful as-is
    for corpus triage (compressed-vs-text detection, binary junk
    filtering) and exactly mirrorable by a SQL oracle, unlike the
    library-dependent image decode (``decode_image_batch``).  Same
    partitioning/batching discipline as ``extract_features``: payloads
    spread by doc_id, payload column dropped on output.
    """

    def round6(vals):
        # HALF-UP (like Spark F.round and DuckDB round), NOT numpy's
        # round-half-to-even: a mean over a power-of-two byte count can
        # land exactly on a .5e-7 boundary, where banker's rounding
        # would diverge from the SQL oracle.  All features are ≥ 0.
        return np.floor(np.asarray(vals, dtype=np.float64) * 1e6 + 0.5) / 1e6

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                feats = [
                    _byte_feature_row(bytes(p) if p is not None else b"")
                    for p in chunk["payload"]
                ]
                yield pd.DataFrame({
                    "doc_id": chunk["doc_id"].to_numpy(),
                    "media_type": chunk["media_type"].to_numpy(),
                    "n_bytes": np.array([f[0] for f in feats], dtype="int32"),
                    "entropy": round6([f[1] for f in feats]),
                    "mean_byte": round6([f[2] for f in feats]),
                    "printable_ratio": round6([f[3] for f in feats]),
                })

    return (
        media.repartition("doc_id")
        .select("doc_id", "media_type", "payload")
        .mapInPandas(run, schema=BYTE_FEATURE_SCHEMA)
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic content-derived stand-in feature vector."""
    d = hashlib.md5(payload or b"").digest()
    return (np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8)
            .astype(np.float32) / 255.0)


#: thumbnail side used by the real decode path — small enough that the
#: per-image resample cost is bounded regardless of source resolution
THUMB_SIDE = 16


def _pil_image_module():
    """``PIL.Image`` if Pillow is importable, else None — the extras
    gate: this sandbox ships no codec libs, a real deployment that
    installs Pillow activates the decode path with zero code change."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _pil_feature(image_mod, payload: bytes) -> np.ndarray:
    """Decode one image payload → FEATURE_DIM floats: per-channel
    mean + per-channel std over a ``THUMB_SIDE``² RGB thumbnail, plus
    log-scaled original width/height.  Undecodable payloads (truncated
    / non-image bytes — routine in crawl data) yield the zero vector
    instead of failing the task."""
    import io

    try:
        with image_mod.open(io.BytesIO(payload)) as img:
            w, h = img.size
            arr = np.asarray(
                img.convert("RGB").resize((THUMB_SIDE, THUMB_SIDE)),
                dtype=np.float32,
            ) / 255.0
    except Exception:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    return np.concatenate([
        arr.mean(axis=(0, 1)),
        arr.std(axis=(0, 1)),
        np.array([np.log1p(w) / 10.0, np.log1p(h) / 10.0],
                 dtype=np.float32),
    ]).astype(np.float32)


def decode_image_batch(payloads: pd.Series,
                       deterministic_stub: bool = False) -> pd.Series:
    """Image decode: REAL when Pillow is importable (thumbnail
    color/shape features via ``_pil_feature``), else gated.

    This container has no codec libs, so without Pillow the call
    raises ``NotImplementedError`` unless ``deterministic_stub=True``,
    in which case a seeded content-derived fake keeps the pipeline
    (schema, partitioning, Arrow batch shape) testable end-to-end.
    The gate is import-time per worker process — installing Pillow in
    a real cluster image activates the decode with no code change.
    """
    if deterministic_stub:
        return payloads.map(lambda p: _fake_feature(bytes(p or b"")))
    image_mod = _pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "image decode requires Pillow (PIL) — not in this container; "
            "pass deterministic_stub=True for the content-derived fake"
        )
    return payloads.map(
        lambda p: _pil_feature(image_mod, bytes(p or b"")))


def extract_features(media: DataFrame, batch_rows: int = 256,
                     deterministic_stub: bool = False) -> DataFrame:
    """media → (doc_id, media_type, feature array<float>, n_bytes).

    The Arrow-batched feature-extraction stage: payloads are
    repartitioned by doc_id (spreads large payloads), decoded per
    batch, and the payload column is dropped on output so downstream
    stages shuffle only small feature rows.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                feats = decode_image_batch(
                    chunk["payload"], deterministic_stub=deterministic_stub
                )
                yield pd.DataFrame({
                    "doc_id": chunk["doc_id"],
                    "media_type": chunk["media_type"],
                    "feature": feats.map(list),
                    "n_bytes": chunk["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int32"),
                })

    return (
        media.repartition("doc_id")
        .select("doc_id", "media_type", "payload")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )
