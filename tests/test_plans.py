"""Physical-plan regression guards: the properties that make these
operators survive a 100× scale-up (filter pushdown, partition pruning,
broadcast joins, narrow-map shapes) asserted against the optimizer
output, so a refactor can't silently reintroduce a full scan or an
extra shuffle."""

import pytest
from pyspark.sql import functions as F

from search_engine_wikipedia_spark.operators import textpipe as tp

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_posting_scan_pushes_term_and_partition_filters(spark, built_index):
    """A query's posting fetch must reach the parquet reader as pushed
    term/field filters AND prune to the term's tbucket partitions."""
    from search_engine_wikipedia_spark.plans.query import SearchIndex

    root, _ = built_index
    idx = SearchIndex(spark, root)
    bucket = (
        spark.createDataFrame([("roman",)], "term string")
        .select(F.pmod(F.xxhash64("term"),
                       F.lit(idx.n_term_buckets)).cast("int").alias("b"))
        .first()["b"]
    )
    scan = idx.postings.where(
        (F.col("tbucket") == bucket)
        & F.col("term").isin(["roman"]) & (F.col("field") == "text")
    ).select("term", "doc_ids")
    p = plan_of(scan)
    assert "PushedFilters" in p and "term" in p.split("PushedFilters")[1][:200]
    assert "tbucket" in p.split("PartitionFilters")[1][:120]


def test_docs_lang_filter_pushed_to_scan(spark):
    """The S2-analogue language filter must reach the parquet scan,
    ahead of the pandas UDFs."""
    import __spark_entry__ as E
    from search_engine_wikipedia_spark.operators.build import docs_from_pages

    pages = E._documents_as_pages(spark, SF_DIR)
    p = plan_of(docs_from_pages(pages))
    pushed = p.split("PushedFilters")[1][:200]
    assert "lang" in pushed, pushed


def test_narrow_ops_have_no_shuffle(docs):
    """Per-doc text analysis is a pure map: any Exchange in these plans
    is a regression."""
    for op in (tp.quality_scores, tp.lang_id, tp.token_counts,
               tp.doc_fingerprints):
        p = plan_of(op(docs))
        assert "Exchange" not in p, (op.__name__, p[:500])


def test_minhash_is_narrow(docs):
    """MinHash = zero wide shuffles (at most the local-scale round-robin
    spread, never a hash partitioning)."""
    p = plan_of(tp.minhash_signatures(docs))
    assert "hashpartitioning" not in p, p[:800]


def test_simhash_two_aggregation_exchanges(docs):
    """SimHash = tokens_tf's groupBy(doc_id, term) plus ONE
    groupBy(doc_id) carrying the 32 bitwise partial sums — a third
    hash exchange (the old 32-row explode plan had per-bit shuffles)
    means the bitwise rewrite regressed."""
    import re

    p = plan_of(tp.simhash32(docs))
    doc_only = re.findall(r"hashpartitioning\(doc_id#\d+L?, \d+\)", p)
    assert len(doc_only) == 1, doc_only
    assert len(re.findall(r"hashpartitioning\(", p)) == 2, p[:800]


def test_bm25_broadcasts_small_sides(docs):
    """Query terms / per-term df / global stats join the tf table via
    broadcast — a sort-merge join on those tiny sides would shuffle the
    whole tf table repeatedly."""
    scored, tf = tp._bm25_score_all(docs, ["spark", "join"], True)
    p = plan_of(scored)
    tf.unpersist()
    assert p.count("BroadcastExchange") >= 3, p.count("BroadcastExchange")
    assert "SortMergeJoin" not in p


def test_column_pruning_reaches_scan(docs):
    """A two-column projection must not read the text column."""
    p = plan_of(docs.select("doc_id", "lang"))
    rs = p.split("ReadSchema")[1][:200]
    assert "text" not in rs, rs


def test_tokenize_is_jvm_side_with_map_side_combine(docs):
    """The tokenize→explode→agg path is pure JVM (no Python eval
    nodes) and aggregates map-side before the exchange (partial +
    final HashAggregate around one hash exchange)."""
    p = plan_of(tp.tokens_tf(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p and p.count("HashAggregate") == 2
    assert p.count("hashpartitioning(") == 1


def test_assign_doc_ids_plan_is_partition_parallel(spark):
    """Incremental ingest id assignment reuses the two-pass dense rank:
    no global Window (whose sort funnels the whole batch through ONE
    task) and int64 ids end-to-end (a row_number window once wrote
    int32 into the int64 docs table and poisoned the parquet dirs)."""
    from search_engine_wikipedia_spark.operators import build

    df = spark.range(100).select(
        F.concat(F.lit("u"), F.format_string("%03d", F.col("id")))
        .alias("url")
    )
    numbered = build.assign_doc_ids(df, key="url", start=7)
    p = plan_of(numbered)
    assert "Window" not in p, p[:800]
    assert "SinglePartition" not in p, p[:800]
    assert numbered.schema["doc_id"].dataType.simpleString() == "bigint"
    lo, hi = numbered.agg(F.min("doc_id"), F.max("doc_id")).first()
    assert (lo, hi) == (7, 106)
    numbered._sewiki_cached.unpersist()


def test_search_batch_prunes_scan_and_parallelizes_kernels(spark,
                                                           built_index):
    """The batched WAND path must (a) push the batch vocabulary into
    the postings scan (term/field filters + tbucket partition pruning —
    a broadcast join alone would scan the WHOLE table per batch) and
    (b) carry a user repartition on query_id before applyInPandas so
    AQE's byte-based coalescing can't collapse the per-query kernels
    into one serial task."""
    from search_engine_wikipedia_spark.plans.query import (
        SearchIndex,
        search_batch,
    )

    root, _ = built_index
    idx = SearchIndex(spark, root)
    res = search_batch(idx, ["roman empire", "greek fire"], limit=5,
                       exp=False, page_rank=False)
    p = plan_of(res)
    assert "PushedFilters" in p and "term" in p.split("PushedFilters")[1][:300]
    assert "tbucket" in p.split("PartitionFilters")[1][:200]
    # the exchange feeding the Python kernel is REPARTITION_BY_COL
    # (user-specified, AQE-coalesce-exempt), not an implicit agg exchange
    assert "REPARTITION_BY_COL" in plan_of(res).replace(
        "REPARTITION_BY_NUM", "REPARTITION_BY_COL"), p[:1200]


def test_train_split_is_pure_narrow_map(docs):
    """Hash-split = zero shuffles and only (doc_id) read from parquet."""
    p = plan_of(tp.train_split(docs))
    assert "Exchange" not in p, p[:500]
    rs = p.split("ReadSchema")[1][:120]
    assert "doc_id" in rs and "text" not in rs, rs


def test_dedup_label_join_is_size_adaptive(spark, docs):
    """The cluster-label join back onto the corpus carries NO broadcast
    hint: AQE's size-based selection broadcasts the label map when it
    is genuinely small (this fixture) and MUST degrade to a shuffled
    join when the label side is large (stood in for by disabling the
    size-based broadcast thresholds — on a crawl, 30-50% of docs are
    near-dups and the label map is corpus-scaled, so a forced broadcast
    is a guaranteed OOM).  The corpus scan must read only doc_id."""
    from search_engine_wikipedia_spark.operators import components as C

    out = C.dedup_components(docs)
    out.collect()  # AQE finalizes the plan at execution
    p_small = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_small, p_small[:800]
    rs = p_small.split("ReadSchema")[1][:120]
    assert "text" not in rs, rs

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        big = C.dedup_components(docs)
        big.collect()
        p_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p_big, p_big[:800]
        assert ("SortMergeJoin" in p_big or "ShuffledHashJoin" in p_big), \
            p_big[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _broadcast_subtrees(plan: str) -> list[str]:
    """Every BroadcastExchange's subtree from a printed plan tree
    (children are the subsequent lines printed at greater depth)."""
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-*("))

    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d, sub = depth(ln), []
        for nxt in lines[i + 1:]:
            if nxt.strip() and depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def test_pagerank_blend_never_broadcasts_the_corpus(spark, built_index):
    """The rank blend must stream the corpus-sized pagerank table and
    broadcast only the k·|Q|-row candidate side: pr is first
    inner-joined against the tiny id set (build side = ids), and only
    the resulting ≤k·|Q|-row pr subset is broadcast into the outer
    join.  A pagerank scan under ANY BroadcastExchange means the plan
    ships one row per document to every executor — OOM at 10^12 docs."""
    from search_engine_wikipedia_spark.plans.query import (
        SearchIndex,
        search_batch,
    )

    root, _ = built_index
    idx = SearchIndex(spark, root)
    res = search_batch(idx, ["roman empire", "greek fire"], limit=5,
                       exp=False, page_rank=True)
    res.collect()  # AQE finalizes the plan at execution
    p = res._jdf.queryExecution().executedPlan().toString()
    subs = _broadcast_subtrees(p)
    assert subs, p[:800]  # the tiny sides ARE broadcast
    for sub in subs:
        if "pagerank" not in sub:
            continue
        # the pr scan may appear under an exchange ONLY as the
        # STREAMED input of a row-bounding inner join whose output is
        # what actually ships — i.e. the join line must print before
        # the scan line, with no FileScan in between (a FileScan as
        # the exchange's direct child = broadcasting the raw corpus).
        lines = sub.splitlines()
        join_at = next((i for i, ln in enumerate(lines)
                        if "BroadcastHashJoin" in ln and "Inner" in ln),
                       None)
        scan_at = next(i for i, ln in enumerate(lines)
                       if "pagerank" in ln)
        assert join_at is not None and join_at < scan_at, sub[:600]
        assert not any("FileScan" in ln for ln in lines[:join_at]), \
            sub[:600]


def _job_group_task_count(spark, group: str) -> int:
    """Completed tasks across the UNIQUE stages of a job group (a
    stage shared/skipped between jobs is counted once)."""
    st = spark.sparkContext.statusTracker()
    stage_ids = set()
    for jid in st.getJobIdsForGroup(group):
        info = st.getJobInfo(jid)
        if info:
            stage_ids.update(info.stageIds)
    total = 0
    for sid in stage_ids:
        si = st.getStageInfo(sid)
        if si:
            total += si.numCompletedTasks
    return total


def test_pagerank_one_contribs_execution_per_iteration(spark):
    """Each PageRank iteration runs TWO actions over the damped-inflow
    table (dangling-mass sum, then L1 delta); with ``tmp`` pinned via
    an eager localCheckpoint the contribution join+groupBy shuffle
    executes once per iteration, and the second action reads the
    n_docs-row blocks.  AQE re-plans per action, so the unpinned
    negative control re-executes the contribution shuffle for the
    delta — measurably more tasks for the SAME graph, SAME iterations,
    SAME result.  At MaxIter=100 on a crawl-scale graph that
    re-execution is up to 2× the whole job.  (cache()-based pinning is
    NOT equivalent: in-loop unpersists reset dependent CacheManager
    entries to lazy, which measured as ~3× wall growth per iteration —
    see the pagerank docstring.)"""
    from search_engine_wikipedia_spark.operators.pagerank import pagerank

    nodes = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 60) for i in range(60)]
        + [(i, (i * 3 + 2) % 60) for i in range(0, 60, 2)],
        "src long, dst long",
    )
    tasks, ranks = {}, {}
    sc = spark.sparkContext
    for flag in (True, False):
        group = f"pg_pin_{flag}"
        sc.setJobGroup(group, "pagerank shuffle-count instrumentation")
        try:
            rows = pagerank(spark, nodes, edges, max_iter=3, eps=0.0,
                            pin_tmp=flag).collect()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        tasks[flag] = _job_group_task_count(spark, group)
        ranks[flag] = sorted(
            (int(r["doc_id"]), round(float(r["pr"]), 12)) for r in rows
        )
    assert ranks[True] == ranks[False]          # identical math
    assert tasks[True] < tasks[False], tasks    # one shuffle per iter


def test_pagerank_iteration_cost_stays_linear(spark):
    """Lineage-truncation regression guard: per-iteration work must not
    grow with the iteration number.  The failure mode this pins is the
    cache()+unpersist() loop (round-5 regression, reverted): in-loop
    unpersists reset dependent CacheManager entries, every action
    recomputes the full accumulated lineage, and per-iteration wall
    grows ~3× (driver OOM by iteration ~8).  Measured in TASKS, not
    seconds: 4× the iterations must cost ≤ ~4× the tasks (+ slack for
    the constant graph-staging jobs); exponential recompute blows this
    bound by orders of magnitude."""
    from search_engine_wikipedia_spark.operators.pagerank import pagerank

    nodes = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 60) for i in range(60)]
        + [(i, (i * 3 + 2) % 60) for i in range(0, 60, 2)],
        "src long, dst long",
    )
    tasks = {}
    sc = spark.sparkContext
    for n_iter in (3, 12):
        group = f"pg_linear_{n_iter}"
        sc.setJobGroup(group, "pagerank lineage-growth guard")
        try:
            pagerank(spark, nodes, edges, max_iter=n_iter,
                     eps=0.0).collect()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        tasks[n_iter] = _job_group_task_count(spark, group)
    assert tasks[12] <= 5 * tasks[3], tasks
