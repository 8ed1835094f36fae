"""Connected components + cluster-level dedup over candidate pairs.

LSH/SimHash/embedding near-dup operators emit candidate PAIRS
(``textpipe.lsh_candidate_pairs``, ``ann.embedding_neardup_pairs``);
an actual 100 TB dedup pass needs CLUSTERS — every document labeled
with a canonical representative so the pipeline can keep exactly one
copy per near-dup group (the step the reference's corpus tooling never
needed at wiki scale, but any web-crawl training pipeline does).

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014): each round is two groupBy-min +
join passes over the edge set, the edge set only ever shrinks toward a
star forest, and convergence takes O(log^2 n) rounds on ANY graph —
unlike naive min-label propagation whose round count is the graph
DIAMETER (a chain of pairwise near-dups, common in crawl data, makes
that O(n)).  Everything is expressed as joins/aggregations (map-side
combinable, AQE-skew-friendly); no collect_list neighborhoods, so a
celebrity node with millions of candidate neighbors cannot OOM a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["connected_components", "dedup_components", "dedup_keep_best"]

_MAX_ROUNDS = 50  # >> log^2 of any conceivable component count


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge list → canonical (u > v) directed, no loops."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-free checksum) of an edge set — one tiny job.

    Used as the convergence test between rounds; an xxhash64-sum
    collision on CHANGED-but-same-fingerprint edge sets is ~2^-64 per
    round and only costs extra rounds (capped), never wrong labels,
    because the final star assertion re-derives labels from the edges.
    """
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of xxhash64 trips ANSI
        # overflow; 38 digits absorbs any row count this can see
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame) -> DataFrame:
    """(u, v) undirected pairs → (node, component) for every node that
    appears in an edge; ``component`` is the MINIMUM node id of the
    connected component (deterministic canonical representative).

    Large-star/small-star rounds, localCheckpointed per round so the
    loop's lineage stays flat (same pattern as PageRank's power
    iteration, ``operators/pagerank.py``).  At convergence the edge
    set IS the component map: a star forest with every non-root
    pointing at its root.
    """
    e = _canon(edges).localCheckpoint(eager=True)
    prev = _fingerprint(e)
    for _ in range(_MAX_ROUNDS):
        if prev[0] == 0:
            break
        # -- large-star: for each u, m = min(neighborhood ∪ {u});
        #    re-point every LARGER neighbor at m
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        mins = (
            sym.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # -- small-star: edges directed big→small; for each u,
        #    m = min(small neighbors); re-point u and every small
        #    neighbor at m
        dirr = _canon(large)
        smins = dirr.groupBy("u").agg(F.min("v").alias("m"))
        joined = dirr.join(smins, "u")
        small = _canon(
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
        )
        nxt = small.localCheckpoint(eager=True)
        cur = _fingerprint(nxt)
        e, prev, done = nxt, cur, (cur == prev)
        if done:
            break
    # star forest: non-roots point at the root; roots map to themselves
    labels = e.select(F.col("u").alias("node"),
                      F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"),
                     F.col("v").alias("component")).distinct()
    return labels.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_components(documents: DataFrame, n_hashes: int = 16,
                     shingle_n: int = 3, rows_per_band: int = 4
                     ) -> DataFrame:
    """(doc_id, component, is_canonical) near-dup cluster labels for
    EVERY document: MinHash → LSH banding → connected components.
    Documents with no candidate pair are their own singleton component.
    ``WHERE is_canonical`` is the dedup filter a training pipeline
    applies before tokenization.

    The label map holds one row per document that appears in ANY
    candidate pair — on a real web crawl that is 30-50% of the corpus,
    i.e. billions of rows at 100 TB, so it is deliberately NOT
    broadcast-hinted: AQE's size-based join selection broadcasts it
    when it is genuinely small and falls back to a shuffled join when
    it is not (``tests/test_plans.py`` asserts the degradation).  A
    hint here would force a driver/executor OOM at crawl dup-rates.
    """
    from . import textpipe

    sigs = textpipe.minhash_signatures(
        documents, n_hashes=n_hashes, shingle_n=shingle_n
    )
    pairs = textpipe.lsh_candidate_pairs(sigs, rows_per_band=rows_per_band)
    comp = connected_components(
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    out = (
        documents.select("doc_id")
        .join(
            comp.withColumnRenamed("node", "doc_id"),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("component")).cast("int"),
        )
    )
    return out


def dedup_keep_best(documents: DataFrame, n_hashes: int = 16,
                    shingle_n: int = 3, rows_per_band: int = 4
                    ) -> DataFrame:
    """(doc_id, component, keep) — near-dup clusters with QUALITY-based
    survivor selection: within each cluster keep the highest
    ``quality_scores`` document (ties → lowest doc_id), not just the
    lowest id.  This is the dedup policy an LLM-training pipeline
    actually wants: when a page exists as both a clean original and a
    boilerplate-wrapped mirror, min-id keeps whichever crawled first;
    quality-keep retains the cleaner text.

    Plan: cluster labels (see ``dedup_components``) join onto the
    quality table (un-hinted — AQE broadcasts only when the label side
    is genuinely small; at crawl dup-rates it is corpus-scaled and the
    shuffled join is the right plan), then one row_number window PER
    COMPONENT — cluster sizes are banding collisions, so the window
    partitions are tiny and skew-free.
    """
    from . import textpipe

    comp = dedup_components(
        documents, n_hashes=n_hashes, shingle_n=shingle_n,
        rows_per_band=rows_per_band,
    ).select("doc_id", "component")
    quality = textpipe.quality_scores(documents).select(
        "doc_id", "quality"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        quality.join(comp, "doc_id")
        .withColumn("keep", (F.row_number().over(w) == 1).cast("int"))
        .select("doc_id", "component", "keep")
    )
