"""Driver-side XXH64 parity: functions/hashing.py must agree with
Spark's ``F.xxhash64`` bit-for-bit, else the query path prunes the
WRONG tbucket partitions and silently returns empty postings."""

import pytest
from pyspark.sql import functions as F

from search_engine_wikipedia_spark.functions.hashing import (
    term_bucket,
    xxhash64,
)

# every XXH64 length class: empty, <4, 4-7, 8-31, 32+, unicode
TRICKY = [
    "", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
    "x" * 31, "y" * 32, "z" * 33, "pneumonoultramicroscopicsilico",
    "roman empire", "üñïçødé-тест-漢字", "  spaces  ", "\n\t",
    "0123456789" * 10,
]


def test_xxhash64_matches_spark(spark):
    rows = (
        spark.createDataFrame([(t,) for t in TRICKY], "term string")
        .select(
            "term",
            F.xxhash64("term").alias("h"),
            F.pmod(F.xxhash64("term"), F.lit(32)).cast("int").alias("b"),
        )
        .collect()
    )
    assert len(rows) == len(TRICKY)
    for r in rows:
        assert xxhash64(r["term"].encode("utf-8")) == r["h"], r["term"]
        assert term_bucket(r["term"], 32) == r["b"], r["term"]


@pytest.mark.parametrize("n", [1, 7, 32, 1024])
def test_term_bucket_in_range(n):
    for t in TRICKY:
        assert 0 <= term_bucket(t, n) < n
