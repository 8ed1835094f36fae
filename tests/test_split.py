"""train_split (textpipe) + dedup_keep_best (components)."""

from pyspark.sql import functions as F

from search_engine_wikipedia_spark.operators import components as C
from search_engine_wikipedia_spark.operators import textpipe as tp


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of document number "),
                 F.col("id").cast("string")).alias("text"),
    )


def test_train_split_deterministic_and_proportioned(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in tp.train_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in tp.train_split(docs).collect()}
    assert a == b  # stable across runs
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n
            for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac["val"] - 0.05) < 0.02
    assert abs(frac["test"] - 0.05) < 0.02
    # membership keyed on doc_id only: a subset keeps its labels
    sub = {r["doc_id"]: r["split"]
           for r in tp.train_split(docs.limit(500)).collect()}
    assert all(a[k] == v for k, v in sub.items())
    # a different salt re-splits
    c = {r["doc_id"]: r["split"]
         for r in tp.train_split(docs, salt="v2").collect()}
    assert c != a


def test_train_split_custom_weights(spark):
    docs = _docs(spark, 500)
    got = {r["split"] for r in tp.train_split(
        docs, weights=(("a", 0.5), ("b", 0.5))).collect()}
    assert got == {"a", "b"}


def test_dedup_keep_best_prefers_quality(spark):
    # 0/1/2 near-identical (one LSH cluster); 2 has the longest clean
    # prose => highest length-saturation quality term
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet green field toward the river "
            "bank where the old wooden bridge crosses into the market")
    rows = [
        (0, base),
        (1, base),
        # a SHORT suffix: long additions change too many shingles and
        # the variant stops sharing any LSH band with its base
        (2, base + " and then continues along the towpath"),
        (3, "unrelated text about adaptive query execution shuffle "
            "partitions and columnar storage formats in modern "
            "distributed analytical engines operating at large scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["component"], r["keep"])
           for r in C.dedup_keep_best(docs).collect()}
    comp_of_0 = got[0][0]
    assert got[1][0] == comp_of_0 and got[2][0] == comp_of_0
    # exactly one survivor per component, and it is the longest doc
    cluster = {d: kv for d, kv in got.items() if kv[0] == comp_of_0}
    assert [d for d, kv in cluster.items() if kv[1] == 1] == [2]
    assert got[3] == (3, 1)
