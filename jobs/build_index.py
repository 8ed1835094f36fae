#!/usr/bin/env python
"""spark-submit entrypoint: build the full inverted index (+ PageRank).

Usage (cluster):
  spark-submit --master <url> --py-files sewiki.zip \
      jobs/build_index.py --input /data/pages --index-dir /data/idx

Usage (local two-level scaling evidence — see jobs/scaling_bench.py):
  spark-submit --master local[8]  jobs/build_index.py --synth 100000 ...
  spark-submit --master local[32] jobs/build_index.py --synth 100000 ...

Emits one JSON line of per-stage metrics (docs/sec indexed, stage
seconds) — the north-rule per-partition metrics surface; per-segment
lineage rows land in the index's ``manifests`` table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="pages parquet path")
    p.add_argument("--input-table",
                   help="pages as a catalog table name (Iceberg/Hive/"
                        "view) — resolved via spark.table()")
    p.add_argument("--synth", type=int, default=0,
                   help="generate N synthetic pages instead of --input")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--n-segments", type=int, default=32,
                   help="SPIMI segments (fixed across parallelism levels "
                        "so scaling runs compare identical work)")
    p.add_argument("--shard-size", type=int, default=1_000_000)
    p.add_argument("--segment-batches", type=int, default=1)
    p.add_argument("--pagerank", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--metrics-out", default="-")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_wikipedia_spark import synth
    from search_engine_wikipedia_spark.operators.build import IndexBuilder
    from search_engine_wikipedia_spark.operators.pagerank import (
        build_pagerank_stage,
    )

    spark = SparkSession.builder.appName("sewiki-build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    if args.synth:
        pages = synth.generate_pages_df(spark, args.synth,
                                        n_partitions=max(par, 8))
    elif args.input_table:
        pages = spark.table(args.input_table)
    else:
        pages = spark.read.parquet(args.input)

    n_segments = args.n_segments
    builder = IndexBuilder(
        spark, args.index_dir, n_segments=n_segments,
        shard_size=args.shard_size, segment_batches=args.segment_batches,
    )
    t0 = time.perf_counter()
    builder.build(pages, resume=not args.no_resume)
    if args.pagerank:
        t_pr = time.perf_counter()
        build_pagerank_stage(spark, args.index_dir)
        builder.metrics["pagerank"] = time.perf_counter() - t_pr
    wall = time.perf_counter() - t0

    # per-partition metrics → manifests table + skew summary in the
    # JSON line (footer reads only; outside the timed window)
    from search_engine_wikipedia_spark.operators import metrics as M

    M.emit_partition_metrics(spark, args.index_dir,
                             ["docs", "postings"])
    n_docs = builder.n_docs
    out = {
        "job": "build_index",
        "n_docs": n_docs,
        "parallelism": par,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
        "stages": {k: round(v, 3) for k, v in builder.metrics.items()},
        "postings_skew": M.skew_report(args.index_dir, "postings"),
    }
    line = json.dumps(out)
    if args.metrics_out == "-":
        print(line, flush=True)
    else:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
