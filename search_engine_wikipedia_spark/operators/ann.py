"""Similarity search over an embedding column (``array<float>``).

Operators over the driver ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``):

* ``cosine_topk``      — brute-force cosine top-k: the correctness
  baseline.  Probe set × corpus cross join, dot/norm computed with
  native higher-order functions (``zip_with`` + ``aggregate`` — JVM
  expressions, no Python), per-probe window top-k.
* ``ivf_topk``         — the scale path: IVF-style partition-pruned
  search.  Vectors are pre-bucketed into coarse cells (here the
  ``label`` column stands in for a k-means cell id, which is how a real
  IVF index materializes on a 100 TB table: cell id computed once at
  ingest, table partitioned by it); a probe searches only its own
  cell, cutting the candidate set by ~|cells|×.
* ``l2_norms``         — per-vector norms (used by both, and a cheap
  sanity surface).

All arithmetic casts float → double before multiplying and sums in
list order, so an external SQL oracle reproduces values bit-for-close
(results are rounded to 6 decimals before ranking; ties break by
vec_id).

Scale notes: brute-force is O(probes × corpus) — fine for re-ranking a
candidate set, wrong as the primary path; IVF prunes the corpus side
via a partition-key equi-join that Catalyst turns into a co-partitioned
shuffle (or broadcast when the probe set is small).  At 10^12 vectors
the cell id becomes the table's physical partition key and the same
plan prunes at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in list order, double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norms(embeddings: DataFrame) -> DataFrame:
    """(vec_id, norm) — L2 norms, rounded to 6 decimals."""
    e = F.col("embedding")
    return embeddings.select(
        "vec_id", F.round(F.sqrt(_dot(e, e)), 6).alias("norm")
    )


def _pairwise_cosine(probes: DataFrame, corpus: DataFrame,
                     join_on: list[str] | None = None) -> DataFrame:
    """(qid, vec_id, cos) for every probe×candidate pair."""
    p = probes.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        *(join_on or []),
    )
    c = corpus.select(
        "vec_id", F.col("embedding").alias("de"), *(join_on or [])
    )
    joined = (
        c.join(F.broadcast(p), join_on) if join_on
        else c.crossJoin(F.broadcast(p))
    )
    qe, de = F.col("qe"), F.col("de")
    return (
        joined
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(
                _dot(qe, de) / F.sqrt(_dot(qe, qe) * _dot(de, de)), 6
            ).alias("cos"),
        )
    )


def cosine_topk(embeddings: DataFrame, probe_ids: list[int],
                k: int = 10) -> DataFrame:
    """Brute-force cosine top-k → (qid, rank, vec_id, cos)."""
    probes = embeddings.where(F.col("vec_id").isin(probe_ids))
    sims = _pairwise_cosine(probes, embeddings)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos")
    )


def ivf_topk(embeddings: DataFrame, probe_ids: list[int],
             k: int = 5) -> DataFrame:
    """IVF-pruned cosine top-k: candidates share the probe's cell
    (``label`` = coarse quantizer cell) → (qid, rank, vec_id, cos)."""
    probes = embeddings.where(F.col("vec_id").isin(probe_ids))
    sims = _pairwise_cosine(probes, embeddings, join_on=["label"])
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos")
    )
