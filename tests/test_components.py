"""Connected components + cluster dedup (operators/components.py).

Reference implementation: a plain union-find run on the collected edge
list — exact ground truth for any graph shape.
"""

import random

import pytest
from pyspark.sql import functions as F

from search_engine_wikipedia_spark.operators import components as C


def _uf_components(n_nodes, edges):
    """node → min-id-of-component via union-find (ground truth)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    out = {}
    for x in list(parent):
        out[x] = find(x)
    return out


def _run_cc(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "u long, v long"
    )
    got = C.connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


@pytest.mark.parametrize(
    "edges",
    [
        [],                                     # empty graph
        [(1, 2)],                               # single edge
        [(5, 5)],                               # pure self-loop
        [(1, 2), (2, 3), (3, 4), (10, 11)],     # chain + separate pair
        [(i, i + 1) for i in range(1, 60)],     # 60-node chain (deep
                                                # diameter: the case that
                                                # breaks naive min-label
                                                # propagation round counts)
        [(1, 2), (1, 3), (1, 4), (2, 3)],       # near-clique
        [(2, 1), (1, 2), (3, 2)],               # duplicates + both dirs
    ],
)
def test_cc_matches_union_find(spark, edges):
    want = _uf_components(None, [(a, b) for a, b in edges if a != b])
    got = _run_cc(spark, edges)
    assert got == want


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 50))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run_cc(spark, edges) == _uf_components(n, edges)


def test_dedup_components_clusters_near_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet green field toward the river bank "
        "where the old wooden bridge crosses into the village market"
    )
    rows = [
        (0, base),
        (1, base),                           # exact dup of 0
        (2, base + " with one extra tail sentence appended here"),
        (3, "completely different text about spark shuffle partitions "
            "and adaptive query execution in distributed engines today "
            "plus some more words to clear the shingle threshold"),
        (4, "another unrelated document mentioning parquet column "
            "pruning predicate pushdown and vectorized readers in "
            "modern analytical processing systems at large scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in C.dedup_components(docs).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    # exact dups always band-collide → same cluster, min id canonical
    assert got[0] == (0, 1)
    assert got[1] == (0, 0)
    # the unrelated docs are singleton canonicals
    assert got[3] == (3, 1)
    assert got[4] == (4, 1)
    # every component label is a member's min doc_id
    for d, (comp, canon) in got.items():
        assert comp <= d
        assert canon == (1 if comp == d else 0)
