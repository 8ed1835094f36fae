"""Randomized maintenance-sequence equivalence (LSM lifecycle fuzz).

A SEEDED random interleaving of the full maintenance surface —
``append_pages`` / ``upsert_pages`` / ``delete_urls`` / ``delete_where``
/ ``compact`` / ``optimize_segments`` — over a small corpus must leave
an index statistically identical (term-stats fingerprint + BM25 scores
by url) to a FRESH build over the logically surviving corpus.  The
pairwise interplay tests in test_ingest/test_delete pin each op's
contract; this pins the lifecycle's closure property: any op ORDER
converges to the same state.
"""

import random

import pandas as pd
import pytest

from search_engine_wikipedia_spark import schemas, synth
from search_engine_wikipedia_spark.operators import ingest
from search_engine_wikipedia_spark.operators.build import IndexBuilder
from search_engine_wikipedia_spark.synth import QUERIES

from tests.test_delete import _search_by_url
from tests.test_ingest import _term_stats_fingerprint

N_POOL = 400
SHARD = 200


def _pages_df(spark, pages):
    return spark.createDataFrame(pd.DataFrame(pages), schema=schemas.PAGES)


def _build(spark, root, pages):
    IndexBuilder(spark, root, n_segments=4, shard_size=SHARD).build(
        _pages_df(spark, pages), resume=False)


def _indexed(page) -> bool:
    """Mirror of docs_from_pages' scan filters (lang + redirect)."""
    return (page["lang"] == "en"
            and not (page["text"] or "").startswith("#REDIRECT"))


@pytest.mark.parametrize("seed", [7, 23])
def test_random_maintenance_sequence_equals_fresh_build(
        spark, tmp_path_factory, seed):
    rng = random.Random(seed)
    pool = [synth.make_page(i, N_POOL) for i in range(N_POOL)]
    base, feed = pool[:150], pool[150:]

    root = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
    _build(spark, root, base)

    # expected logical state: url -> latest surviving page revision
    live: dict[str, dict] = {p["url"]: p for p in base}
    feed_at = 0
    rev = 0

    def indexed_urls():
        return sorted(u for u, p in live.items() if _indexed(p))

    ops = ["append", "upsert", "delete_urls", "delete_where",
           "compact", "optimize"]
    trace = []
    for _ in range(8):
        op = rng.choice(ops)
        trace.append(op)
        if op == "append" and feed_at < len(feed):
            chunk = feed[feed_at:feed_at + 25]
            feed_at += 25
            ingest.append_pages(spark, root, _pages_df(spark, chunk),
                                shard_size=SHARD)
            for p in chunk:
                live.setdefault(p["url"], p)
        elif op == "upsert":
            victims = rng.sample(indexed_urls(),
                                 min(5, len(indexed_urls())))
            rev += 1
            batch = [dict(live[u],
                          text=live[u]["text"] + f" zzrevision{rev}")
                     for u in victims]
            if not batch:
                continue
            ingest.upsert_pages(spark, root, _pages_df(spark, batch),
                                shard_size=SHARD)
            for p in batch:
                live[p["url"]] = p
        elif op == "delete_urls":
            victims = rng.sample(indexed_urls(),
                                 min(4, len(indexed_urls())))
            if not victims:
                continue
            ingest.delete_urls(spark, root, victims)
            for u in victims:
                live.pop(u)
        elif op == "delete_where":
            suffix = str(rng.randrange(10))
            ingest.delete_where(spark, root, f"url LIKE '%{suffix}'")
            for u in [u for u in live if u.endswith(suffix)]:
                live.pop(u)
        elif op == "compact":
            ingest.compact(spark, root, shard_size=SHARD)
        elif op == "optimize":
            ingest.optimize_segments(spark, root)

    # converge: tombstoned stats differ from fresh by design (Lucene
    # live-docs semantics), so the equivalence claim is post-compact
    ingest.compact(spark, root, shard_size=SHARD)

    fresh = str(tmp_path_factory.mktemp(f"fuzz{seed}_fresh"))
    _build(spark, fresh, sorted(live.values(), key=lambda p: p["url"]))

    assert (_term_stats_fingerprint(spark, root)
            == _term_stats_fingerprint(spark, fresh)), trace
    got = _search_by_url(spark, root, QUERIES[:10])
    want = _search_by_url(spark, fresh, QUERIES[:10])
    assert got == want, trace
