#!/usr/bin/env python
"""Headline benchmark: index-build docs/sec, WAND query throughput, and
the training-data pipeline operators, at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

Extras (informational): docs_per_sec (index build), queries_per_sec
(30-query block-max WAND batch), n_docs, cpus.

Run `python jobs/scaling_bench.py` for the two-parallelism (N vs 4N
cores) scaling-efficiency evidence → BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(sf_dir: str, cpus: int, out=sys.stdout, keep_index: str | None = None):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from search_engine_wikipedia_spark import hostprobe
    from search_engine_wikipedia_spark.operators.build import IndexBuilder
    from search_engine_wikipedia_spark.plans.query import SearchIndex, search_batch

    # ---- host-window gate (same instrument as jobs/scaling_bench.py) ----
    # This box's burst-credit throttling inflated BENCH_r04 ~1.3-1.4×
    # uniformly across every op, including pure-numpy ones no commit
    # touched; an ungated wall-clock number here is unadjudicable.  The
    # probe runs at 8 threads — the calibrated gauge with four rounds of
    # recorded history (clean windows read 0.92-1.07; drifted ones
    # 0.72-0.85) — NOT at ``cpus``, where the host's steady-state ~30%
    # steal under 32 busy threads would mask window-to-window drift.
    # Gate: wait up to SPARK_GRAFT_PROBE_WAIT sec for a clean window; if
    # it never clears, run anyway but LABEL the output (the per-round
    # driver must still get a BENCH json) — "window_clean": false means
    # "compare rates, not this run's absolute walls".
    probe_pre: dict | None = None
    window_clean = None
    # one parse, shared by the pre-gate and the post-run re-check, so
    # "window_clean" always means the SAME bar at both ends of the run
    min_ratio = float(os.environ.get("SPARK_GRAFT_PROBE_MIN", "0.93"))
    if os.environ.get("SPARK_GRAFT_PROBE_GATE", "1") != "0":
        max_wait = float(os.environ.get("SPARK_GRAFT_PROBE_WAIT", "900"))
        probe_pre = hostprobe.wait_for_clean_window(
            8, min_ratio=min_ratio, max_wait=max_wait)
        window_clean = probe_pre["per_core_ratio"] >= min_ratio

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    t_all = time.perf_counter()

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return r

    # --- 1. index build (SPIMI → salted merge → stats) -------------------
    root = keep_index or f"/tmp/sewiki_bench_{sf}_{cpus}"
    shutil.rmtree(root, ignore_errors=True)
    pages = E._documents_as_pages(spark, sf_dir)
    n_docs = pages.count()
    builder = IndexBuilder(spark, root, n_segments=max(8, cpus),
                           shard_size=200_000)
    timed("index_build", lambda: builder.build(pages, resume=False))
    docs_per_sec = round(n_docs / timings["index_build"], 1)

    # --- 2. query throughput: 30-query block-max WAND batch --------------
    queries30 = (E.ENGINE_QUERIES * 3)[:30]
    idx = SearchIndex(spark, root)
    res = timed(
        "wand_batch30",
        lambda: search_batch(idx, queries30, limit=10, exp=False,
                             page_rank=False).collect(),
    )
    assert len(res) > 0
    queries_per_sec = round(30 / timings["wand_batch30"], 2)

    # single-query latency (interactive driver path, warm posting cache)
    from search_engine_wikipedia_spark.plans.query import WikiSearcher

    searcher = WikiSearcher(idx)
    for q in queries30:  # warm the per-term posting cache
        searcher.search(q, limit=10, exp=False, page_rank=False,
                        with_meta=False)
    lat = []
    for q in queries30 * 3:
        t0 = time.perf_counter()
        searcher.search(q, limit=10, exp=False, page_rank=False,
                        with_meta=False)
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat.sort()
    latency_p50 = round(lat[len(lat) // 2], 2)
    latency_p95 = round(lat[int(len(lat) * 0.95)], 2)

    # --- 3. pipeline operators over the same table -----------------------
    Q = E.queries()
    for name in (
        "tokenize_tf", "term_stats", "bm25_and_topk", "batch_topk",
        "dedup_exact", "minhash_signatures", "lsh_candidate_pairs",
        "ngram_jaccard_pairs", "simhash32", "dedup_components",
        "train_split", "quality_scores", "lang_id",
        "token_counts", "doc_fingerprints", "ann_cosine_topk",
        "ann_ivf_topk", "ann_ivf_trained", "multimodal_features",
        "resolve_edges", "pagerank_5iter",
    ):
        df = Q[name](spark, sf_dir)
        timed(name, lambda d=df: d.write.format("noop").mode("overwrite").save())

    # --- 4. index maintenance: tombstone delete + compaction -------------
    # 1% of docs, contiguous by doc_id (a recrawl/takedown batch shape);
    # runs LAST so it cannot perturb the query measurements above.
    from search_engine_wikipedia_spark.operators import ingest as ING
    from search_engine_wikipedia_spark.sources import catalog as CAT

    def rewrite_counts():
        """files-rewritten per table, from the compact lineage rows
        (stage compact_rewrite:<tbl>, n_terms = files rewritten)."""
        return sorted(
            (r["stage"], int(r["n_terms"]), str(r["build_ts"]))
            for r in CAT.read_lineage(spark, root)
            .where(F.col("stage").startswith("compact_rewrite:"))
            .collect()
        )

    n_victims = max(10, n_docs // 100)
    victim_urls = [
        r["url"]
        for r in CAT.read_table(spark, root, "docs")
        .orderBy("doc_id").limit(n_victims).select("url").collect()
    ]
    timed("delete_urls", lambda: ING.delete_urls(spark, root, victim_urls))
    timed("compact", lambda: ING.compact(spark, root))
    seen = rewrite_counts()
    files_1pct = {s.split(":", 1)[1]: n for s, n, _ in seen}

    # --- 5. MASS delete: 20% of survivors, spread across the id space
    # (every 5th doc) — the worst case for the selective rewrite, since
    # a spread victim set intersects essentially every file's footer
    # range and most tbuckets.  This is the cadence where the
    # O(touched-files) claim has to be paid in full, not dodged.
    mass_urls = [
        r["url"]
        for r in CAT.read_table(spark, root, "docs")
        .where(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
        .select("url").collect()
    ]
    timed("delete_20pct",
          lambda: ING.delete_urls(spark, root, mass_urls))
    timed("compact_20pct", lambda: ING.compact(spark, root))
    files_20pct = {
        s.split(":", 1)[1]: n
        for s, n, _ in rewrite_counts() if (s, n, _) not in set(seen)
    }

    total = round(time.perf_counter() - t_all, 3)
    probe_post = (hostprobe.spin_probe(8)
                  if probe_pre is not None else None)
    if window_clean is not None and probe_post is not None:
        window_clean = bool(
            window_clean
            and probe_post["per_core_ratio"] >= min_ratio - 0.03
        )
    result = {
        "metric": "index-build docs/sec + WAND query batch + pipeline ops",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "cpus": cpus,
        "docs_per_sec": docs_per_sec,
        "queries_per_sec": queries_per_sec,
        "latency_ms_p50": latency_p50,
        "latency_ms_p95": latency_p95,
        "n_deleted_1pct": n_victims,
        "n_deleted_20pct": len(mass_urls),
        "files_rewritten_1pct": files_1pct,
        "files_rewritten_20pct": files_20pct,
        "spin_probe_pre": probe_pre,
        "spin_probe_post": probe_post,
        "window_clean": window_clean,
    }
    print(json.dumps(result), file=out, flush=True)
    spark.stop()
    if keep_index is None:
        shutil.rmtree(root, ignore_errors=True)
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    run(sf_dir, cpus)
