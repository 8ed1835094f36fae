"""Incremental index ingest: append new pages to a built index.

The reference engine rebuilds its Whoosh index from scratch per dump
(``indexing/index.py:87-153``); a continuous-crawl deployment instead
appends. This module adds Lucene-NRT-style segment-level increments on
top of ``IndexBuilder``'s catalog layout:

* new pages become NEW doc_ids (continuing after the current max) and
  ONE new segment (seg_id = current max + 1) — docs / term_freqs /
  doc_stats append; field_stats recompute from the (cheap) doc_stats
  table; the new segment's postings encode exactly like a base
  segment and land via dynamic partition overwrite + a lineage row,
* the global ``postings`` table re-merges from all segments.  Because
  delta segments hold strictly-higher doc ranges, the monotone-salt
  invariant of ``merge_segments`` (seg_id ↑ ⇒ doc range ↑) holds with
  ``n_segments = total segment count``, so head-term skew handling is
  identical to a fresh build.  (A tiered merge that rewrites only
  shards overlapping the delta is the production refinement; the
  re-merge here is segment-parallel and touches no upstream stage.)

Scoring matches a from-scratch build over the union corpus exactly:
df/cf/avgfl/N are global after the merge, so BM25 scores are equal —
only doc_id ASSIGNMENT differs (arrival order vs global url rank),
which affects nothing but tie-breaks among equal-scored docs
(`tests/test_ingest.py` asserts score-level equivalence by url).

``stream_ingest`` runs the same append per micro-batch via
``writeStream.foreachBatch`` — exactly-once per epoch is inherited
from the idempotent segment write (overwrite) + lineage dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..sources import catalog
from .build import (
    N_TERM_BUCKETS,
    build_segments,
    docs_from_pages,
    field_stats_from_doc_stats,
    merge_segments,
    term_freqs,
    with_term_bucket,
)


def _append_table(df: DataFrame, root: str, name: str) -> None:
    df.write.mode("append").parquet(catalog.table_path(root, name))
    catalog.commit(catalog.table_path(root, name))


def append_pages(
    spark: SparkSession,
    root: str,
    pages: DataFrame,
    shard_size: int = 1_000_000,
    n_term_buckets: int | None = None,
) -> int:
    """Append a page batch to the index at ``root``; returns the number
    of new documents indexed (0 for an empty/all-duplicate batch).

    New urls only — re-crawled urls already in the index are skipped
    (the reference's corpus is deduplicated upstream; updating in place
    would need doc tombstones, out of scope).
    """
    docs_tbl = catalog.read_table(spark, root, "docs")
    stats = docs_tbl.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).collect()[0]
    start_id = int(stats["mx"]) + 1 if stats["n"] else 0

    new_docs = docs_from_pages(pages).join(
        docs_tbl.select("url"), "url", "left_anti"
    )
    # deterministic id assignment: url-sorted within the batch,
    # continuing after the current max id
    from pyspark.sql import Window as W

    w = W.orderBy("url")
    new_docs = (
        new_docs.withColumn(
            "doc_id", F.row_number().over(w) + F.lit(start_id - 1)
        ).select("doc_id", "url", "title", "clean_text", "links")
    )
    new_docs = new_docs.localCheckpoint(eager=True)  # stable ids, one pass
    n_new = new_docs.count()
    if n_new == 0:
        return 0

    seg_tbl = catalog.read_table(spark, root, "term_freqs")
    next_seg = int(seg_tbl.agg(F.max("seg_id")).collect()[0][0]) + 1

    _append_table(new_docs, root, "docs")
    catalog.append_lineage(spark, root, [
        {"stage": "docs", "seg_id": next_seg, "n_docs": n_new}
    ])

    # one delta segment: constant seg_id (n_segments=1 over the batch)
    tf_new = term_freqs(new_docs, 1, n_new).withColumn(
        "seg_id", F.lit(next_seg)
    )
    _append_table(tf_new, root, "term_freqs")

    tf_delta = catalog.read_table(spark, root, "term_freqs").where(
        F.col("seg_id") == next_seg
    )
    from .build import doc_stats_from_tf

    ds_new = doc_stats_from_tf(new_docs, tf_delta)
    _append_table(ds_new, root, "doc_stats")
    doc_stats = catalog.read_table(spark, root, "doc_stats")
    catalog.write_table(
        field_stats_from_doc_stats(doc_stats), root, "field_stats"
    )

    seg_df = build_segments(tf_delta).repartition(1, "seg_id")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (seg_df.write.mode("overwrite").partitionBy("seg_id")
         .parquet(catalog.table_path(root, "postings_seg")))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    catalog.commit(catalog.table_path(root, "postings_seg"))
    catalog.append_lineage(spark, root, [
        {"stage": "postings_seg", "seg_id": next_seg, "n_docs": n_new}
    ])

    remerge(spark, root, shard_size=shard_size,
            n_term_buckets=n_term_buckets)
    return n_new


def remerge(spark: SparkSession, root: str, shard_size: int = 1_000_000,
            n_term_buckets: int | None = None) -> None:
    """Global merge over ALL segments (base + deltas): identical plan
    to the build's merge stage with n_segments = total count."""
    seg = catalog.read_table(spark, root, "postings_seg")
    n_total = int(seg.agg(F.max("seg_id")).collect()[0][0]) + 1
    if n_term_buckets is None:
        import os

        proot = catalog.table_path(root, "postings")
        n_term_buckets = max(
            (int(d.split("=")[1]) for d in os.listdir(proot)
             if d.startswith("tbucket=")),
            default=N_TERM_BUCKETS - 1,
        ) + 1 if os.path.exists(proot) else N_TERM_BUCKETS
    merged = with_term_bucket(
        merge_segments(seg, n_total, shard_size=shard_size),
        n_term_buckets,
    ).repartition(n_term_buckets, "tbucket")
    catalog.write_table(merged, root, "postings",
                        partition_by=["tbucket"])
    catalog.append_lineage(spark, root, [
        {"stage": "postings", "n_terms": None, "n_docs": None}
    ])


def stream_ingest(spark: SparkSession, root: str, stream_pages: DataFrame,
                  checkpoint_dir: str, shard_size: int = 1_000_000):
    """Continuous ingest: one ``append_pages`` per micro-batch.

    ``stream_pages`` is a streaming DataFrame with the pages schema;
    returns the started StreamingQuery.  The foreachBatch body is the
    idempotent batch append (segment overwrite + url dedup), so an
    epoch replay after failure cannot duplicate postings.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        append_pages(spark, root, batch_df, shard_size=shard_size)

    return (
        stream_pages.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
