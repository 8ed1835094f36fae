"""Trained-IVF quality: the k-means-pruned search must recover most of
the brute-force cosine top-k, and multi-probe must close the gap.

(Measured at sf0.001: mean recall@10 = 0.80 @ n_probe=1, 0.90 @ 2,
0.96 @ 4 — floors below leave slack for fixture regeneration.)
"""

import pytest

from search_engine_wikipedia_spark.operators import ann

SF_DIR = "/root/testdata/sf0.001"
PROBES = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    return out


def _mean_recall(got, truth):
    return sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def test_ivf_trained_recall_and_multiprobe(emb):
    truth = _topk_sets(ann.cosine_topk(emb, PROBES, k=10).collect())
    r1 = _mean_recall(
        _topk_sets(ann.ivf_trained_topk(emb, PROBES, k=10,
                                        n_probe=1).collect()), truth)
    r4 = _mean_recall(
        _topk_sets(ann.ivf_trained_topk(emb, PROBES, k=10,
                                        n_probe=4).collect()), truth)
    assert r1 >= 0.6, r1
    assert r4 >= r1, (r1, r4)
    assert r4 >= 0.85, r4


def test_kmeans_deterministic_and_shaped(emb):
    c1 = ann.kmeans_fit(emb, k=8, n_iter=3)
    c2 = ann.kmeans_fit(emb, k=8, n_iter=3)
    assert c1 == c2  # seed-free deterministic (init + rounded means)
    assert len(c1) == 8 and all(len(v) == 64 for _, v in c1)


def test_kmeans_reduces_sse(emb):
    """Lloyd iterations must not increase within-cluster SSE (computed
    on the rounded centroids, so equality is allowed)."""
    import numpy as np

    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}

    def sse(cents):
        arr = np.stack([np.asarray(c, dtype=np.float64) for _, c in cents])
        return sum(
            float(((arr - v) ** 2).sum(axis=1).min()) for v in vecs.values()
        )

    s0 = sse(ann.kmeans_fit(emb, k=8, n_iter=0))
    s1 = sse(ann.kmeans_fit(emb, k=8, n_iter=1))
    s3 = sse(ann.kmeans_fit(emb, k=8, n_iter=3))
    assert s1 <= s0 + 1e-6
    assert s3 <= s1 + 1e-6
