"""Local mirror of the driver correctness gate: every ``queries()``
entry runs on Spark and (when an oracle exists) the matching
``oracle_sql()`` runs on DuckDB over the same parquet tables; results
must agree exactly (row count, column names, sorted values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, ddb):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), (name, len(s_rows), len(d_rows))
    s_set, d_set = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, (name, mismatches[:5])


def test_wand_consistency_all_agree(spark):
    """The flagship WAND path vs its independent relational BM25F
    referee: every (query, rank) row must agree on doc and score."""
    rows = QUERIES["wand_consistency"](spark, SF_DIR).collect()
    assert rows
    bad = [r.asDict() for r in rows if not r["agree"]]
    assert not bad, bad[:5]


def test_syntax_consistency_all_agree(spark):
    """The query-SYNTAX workload (NOT/parens/field:/^boost/wildcards)
    under AND and OR grouping, plus an expansion-ON batch (synonym
    branch matching real corpus terms), each submitted as ONE batch:
    the WAND kernel batch, the broadcast posting-cache path, and the
    relational referee must agree on every (mode, query, doc, score)
    row."""
    rows = QUERIES["syntax_consistency"](spark, SF_DIR).collect()
    assert rows
    modes = {r["mode"] for r in rows}
    assert modes == {"and", "or", "exp"}, modes
    for m in ("and", "or"):
        assert len({r["query_id"] for r in rows
                    if r["mode"] == m}) >= 8     # workload ran wide
    assert len({r["query_id"] for r in rows if r["mode"] == "exp"}) >= 4
    bad = [r.asDict() for r in rows if not r["agree"]]
    assert not bad, bad[:5]


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES
