"""Link graph construction + PageRank power iteration (G1-G5).

Reference: ``indexing/pageRank/graph.py`` — a SNAP ``TNGraph`` built
from page links (title-keyed dict probe join, ``graph.py:99-119``) and
``snap.GetPageRank(C=0.85, Eps=1e-4, MaxIter=100)`` (``graph.py:168-170``).

SNAP's GetPageRank (public source, snap-stanford) is the Berkhin
formulation of the damped power method::

    tmp_v   = C · Σ_{u→v} pr_u / outdeg_u
    leaked  = (1 − Σ_v tmp_v) / N          # reinserts (1−C) + dangling mass
    pr'_v   = tmp_v + leaked
    stop when Σ_v |pr'_v − pr_v| < eps   (or after max_iter)

which is equivalent to the standard damped PageRank with uniform
dangling-mass redistribution.  Implemented as a DataFrame loop: one
shuffle (groupBy dst) per iteration, ranks localCheckpoint'ed every few
iterations to cut lineage — the standard Spark pattern for iterative
graph algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85   # graph.py:168
EPS = 1e-4       # graph.py:169
MAX_ITER = 100   # graph.py:170


def build_edges(docs: DataFrame) -> DataFrame:
    """docs(doc_id, title, links) → distinct edges (src, dst).

    The reference stages ``{title: (id, set(links))}`` and probes each
    link title against the dict (an inner equi-join, ``graph.py:99-119``);
    the ``set`` dedups multi-links (``graph.py:94-96``).  Spark-first:
    explode the link array, dedup, inner-join on title.  The title side
    is a projection of docs — Catalyst picks broadcast vs sort-merge by
    size (AQE); at web scale this is a sort-merge join on title, which
    is exactly right.
    """
    targets = docs.select(
        F.col("title"), F.col("doc_id").alias("dst")
    )
    staged = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array_distinct("links")).alias("title"),
        )
    )
    return (
        staged.join(targets, "title", "inner")
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    spark: SparkSession,
    nodes: DataFrame,        # (doc_id)
    edges: DataFrame,        # (src, dst)
    damping: float = DAMPING,
    eps: float = EPS,
    max_iter: int = MAX_ITER,
    checkpoint_every: int = 8,
    pin_tmp: bool = True,
) -> DataFrame:
    """→ (doc_id, pr), matching SNAP/Berkhin semantics above.

    Scale notes: edges are hash-partitioned once on ``src`` and cached —
    every iteration reuses that partitioning for the contribution join;
    the per-iteration shuffle is the groupBy(dst).  Convergence (L1
    delta < eps) is checked driver-side each iteration, mirroring
    SNAP's early exit.

    ``pin_tmp`` eagerly ``localCheckpoint``s the per-iteration
    damped-inflow table, which does two load-bearing things at once:

    * the contribution join+groupBy executes exactly ONCE per iteration
      even though two actions consume it (the dangling-mass sum and the
      L1 delta) — AQE re-plans per action, so an unpinned ``tmp`` would
      run the contribution shuffle twice, up to 2× the whole PageRank
      cost at MaxIter=100 on a crawl-scale graph;
    * the logical plan is truncated EVERY iteration.  cache()-based
      pinning cannot do this safely in a loop: unpersisting the
      previous iteration's entries resets every dependent CacheManager
      entry to lazy, so later actions recompute the full accumulated
      lineage — measured on this repo as ~3× wall growth PER ITERATION
      (0.9 s → 35 s by iteration 6 on a 300-doc graph) ending in a
      driver OOM while AQE rendered the exploded plan string.

    Old iterations' checkpoint blocks are reclaimed by the
    ContextCleaner when their DataFrames are GC'd (same pattern as
    ``ingest.delete_urls``); blocks store MEMORY_AND_DISK so a long run
    spills rather than OOMs.  On a multi-node cluster, flip every Kth
    iteration to a reliable ``checkpoint()`` (HDFS) if executor loss
    over hour-long runs matters — localCheckpoint blocks are not
    recoverable.

    ``pin_tmp=False`` exists only as the negative control for the
    instrumentation test guarding the one-shuffle-per-iteration
    invariant (tests/test_plans.py); it bounds lineage with a
    ``localCheckpoint`` of the ranks every ``checkpoint_every``
    iterations instead.
    """
    n_docs = nodes.count()
    if n_docs == 0:
        return spark.createDataFrame([], "doc_id long, pr double")

    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-join static (src, dst, outdeg), repartition on src, cache
    graph = (
        edges.join(outdeg, "src")
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "src")
        .cache()
    )
    graph.count()

    ranks = nodes.select("doc_id", F.lit(1.0 / n_docs).alias("pr"))

    for it in range(max_iter):
        contribs = (
            graph.join(ranks, graph["src"] == ranks["doc_id"], "inner")
            .select(
                F.col("dst").alias("doc_id"),
                (F.col("pr") / F.col("outdeg")).alias("w"),
            )
            .groupBy("doc_id")
            .agg(F.sum("w").alias("inflow"))
        )
        tmp = (
            nodes.join(contribs, "doc_id", "left")
            .select(
                "doc_id",
                (F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("tmp"),
            )
        )
        if pin_tmp:
            # eager: runs the contribution shuffle (the iteration's ONE
            # heavy job) and truncates lineage; both following actions
            # read the materialized n_docs-row blocks
            tmp = tmp.localCheckpoint()
        total = tmp.agg(F.sum("tmp")).collect()[0][0] or 0.0
        leaked = (1.0 - total) / n_docs
        # narrow literal-add over the pinned blocks — needs no pin of
        # its own: next iteration's recompute is a map over tmp's RDD
        new_ranks = tmp.select(
            "doc_id", (F.col("tmp") + F.lit(leaked)).alias("pr")
        )
        if not pin_tmp and (it + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint()
        diff = (
            new_ranks.join(ranks.withColumnRenamed("pr", "pr_old"), "doc_id")
            .agg(F.sum(F.abs(F.col("pr") - F.col("pr_old"))))
            .collect()[0][0]
        ) or 0.0
        ranks = new_ranks
        if diff < eps:
            break
    graph.unpersist()
    return ranks.select("doc_id", "pr")


def build_pagerank_stage(spark, index_dir: str, **kwargs) -> None:
    """Catalog stage: docs → edges + pagerank tables (with manifests)."""
    from ..sources import catalog

    docs = catalog.read_table(spark, index_dir, "docs")
    edges = build_edges(docs)
    catalog.write_table(edges, index_dir, "edges")
    edges = catalog.read_table(spark, index_dir, "edges")
    ranks = pagerank(spark, docs.select("doc_id"), edges, **kwargs)
    catalog.write_table(ranks, index_dir, "pagerank")
    catalog.append_lineage(spark, index_dir, [
        {"stage": "pagerank", "n_docs": ranks.count()}
    ])
