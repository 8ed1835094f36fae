"""Whoosh query-syntax surface (plans/qsyntax.py): parser structure
goldens, NOT/boost/field/wildcard rank identity vs the exhaustive
oracle, and kernel ↔ relational ↔ batch agreement.

The reference exposes this syntax through Whoosh's default-plugin
``QueryParser`` (searcher.py:53-55); phrases are disabled by the
reference schema (index.py:38-39 ``phrase=False``).
"""

import numpy as np
import pytest

from search_engine_wikipedia_spark.operators.wand import And, Not, Or, Term
from search_engine_wikipedia_spark.plans import qsyntax as qs
from search_engine_wikipedia_spark.plans.query import (
    SearchIndex,
    WikiSearcher,
    _tree_spec,
    parse_query,
    search_batch,
    search_batch_relational,
    search_many_broadcast,
)

TOL = 1e-9

# vocabulary-aware syntax queries over the synth corpus
SYNTAX_QUERIES = [
    "Roman AND NOT Empire",
    "Solar NOT energy",
    "NOT history Tuscany",
    "(Roman Empire) OR Tuscany",
    "Hollywood OR Maya science",
    "title:Tuscany",
    "text:ancient title:Tuscany",
    "Roman^3 Empire",
    "rob* war",
    "progr?m empire",
]


# ---------------------------------------------------------------------------
# parser structure (pure driver-side, no Spark)
# ---------------------------------------------------------------------------
def _leaf(w):
    f = w.field or "m"
    return Term(f, ("PAT:" if w.is_pattern else "") + w.text, w.boost)


def _show(n):
    if n is None:
        return "∅"
    if isinstance(n, Term):
        b = f"^{n.boost}" if n.boost != 1.0 else ""
        return f"{n.field}:{n.text}{b}"
    if isinstance(n, Not):
        return f"NOT({_show(n.child)})"
    tag = "And" if isinstance(n, And) else "Or"
    return f"{tag}({', '.join(_show(c) for c in n.children)})"


@pytest.mark.parametrize("text,group,want", [
    # adjacency joins with the group operator
    ("a b", "AND", "And(m:a, m:b)"),
    ("a b", "OR", "Or(m:a, m:b)"),
    # Whoosh operators are NEIGHBOR-binding, leftmost first — not
    # precedence-climbing: OR binds a,b then the AndGroup wraps c
    ("a OR b c", "AND", "And(Or(m:a, m:b), m:c)"),
    ("a b AND c", "OR", "Or(m:a, And(m:b, m:c))"),
    ("a AND b OR c", "AND", "Or(And(m:a, m:b), m:c)"),
    # NOT binds its right atom, before the infix pass
    ("a AND NOT b", "AND", "And(m:a, NOT(m:b))"),
    ("a NOT b", "AND", "And(m:a, NOT(m:b))"),
    ("NOT a b", "AND", "And(NOT(m:a), m:b)"),
    ("NOT (a b)", "AND", "NOT(And(m:a, m:b))"),
    # parens group with the surrounding group semantics
    ("a AND (b OR c)", "AND", "And(m:a, Or(m:b, m:c))"),
    ("(a b) OR c", "AND", "Or(And(m:a, m:b), m:c)"),
    # fields / boosts / wildcards
    ("title:rome empire^2", "AND", "And(title:rome, m:empire^2.0)"),
    ("text:x^1.5 y", "AND", "And(text:x^1.5, m:y)"),
    ("euro* x", "AND", "And(m:PAT:euro*, m:x)"),
    # unknown field name: token passes through as plain text (Whoosh)
    ("foo:bar a", "AND", "And(m:foo:bar, m:a)"),
    # lenient on dangling operators / unbalanced parens (Whoosh-like)
    ("a AND", "AND", "m:a"),
    ("AND a", "AND", "m:a"),
    ("a ( b", "AND", "And(m:a, m:b)"),
    ("a )", "AND", "m:a"),
    ("", "AND", "∅"),
    ("NOT", "AND", "∅"),
    # same-type groups flatten (Whoosh clean merge)
    ("a AND b AND c", "AND", "And(m:a, m:b, m:c)"),
    ("a OR b OR c", "AND", "Or(m:a, m:b, m:c)"),
])
def test_parser_structure(text, group, want):
    assert _show(qs.parse_syntax(text, group, _leaf)) == want


def test_phrase_raises():
    with pytest.raises(qs.QuerySyntaxError, match="phrase"):
        qs.parse_syntax('"exact phrase" x', "AND", _leaf)


def test_has_syntax_gate():
    # every reference evaluation query is plain → legacy parse path
    from search_engine_wikipedia_spark.synth import QUERIES

    assert not any(qs.has_syntax(q) for q in QUERIES)
    for s in ["a AND b", "NOT x", "title:x", "eur*", "wom?n", "(a b)",
              "x^2", '"p q"']:
        assert qs.has_syntax(s), s
    for s in ["plain words", "andrew or x", "not lowercase", "foo:bar"]:
        assert not qs.has_syntax(s), s


def test_pattern_helpers():
    assert qs.pattern_prefix("euro*") == "euro"
    assert qs.pattern_prefix("*euro") == ""
    assert qs.pattern_prefix("wom?n") == "wom"
    assert qs.pattern_regex("euro*") == "^euro.*$"
    assert qs.pattern_regex("wom?n") == "^wom.n$"
    assert qs.pattern_regex("a+b*") == r"^a\+b.*$"


# ---------------------------------------------------------------------------
# rank identity vs the exhaustive oracle
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sidx(spark, built_index):
    root, oracle = built_index
    idx = SearchIndex(spark, root)
    return idx, WikiSearcher(idx), oracle


def _oracle_topk(oracle, spec, limit=10, model="BM25F"):
    scored = []
    for doc in sorted(oracle.node_candidates(spec)):
        m, s = oracle.eval_node(spec, doc, model)
        if m:
            scored.append((doc, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:limit]


@pytest.mark.parametrize("group", ["AND", "OR"])
def test_syntax_rank_identity(sidx, group):
    idx, searcher, oracle = sidx
    for q in SYNTAX_QUERIES:
        tree, _ = parse_query(q, group=group, analyzers=idx.analyzers,
                              index=idx)
        expected = _oracle_topk(oracle, _tree_spec(tree))
        res = searcher.search(q, limit=10, exp=False, page_rank=False,
                              group=group, with_meta=False)
        got = [(d["doc_id"], d["score"]) for d in res["docs"]]
        assert [g[0] for g in got] == [e[0] for e in expected], (q, group)
        for (gd, gs), (_, es) in zip(got, expected):
            assert abs(gs - es) < TOL, (q, group, gd)


def test_not_actually_excludes(sidx):
    idx, searcher, oracle = sidx
    # filler terms co-occur only randomly, so the three sets are all
    # non-trivial (topic terms like "Roman Empire" inject as phrases —
    # their NOT-complement within the topic is empty by construction)
    base = {d["doc_id"] for d in searcher.search(
        "history", limit=1000, exp=False, page_rank=False,
        with_meta=False)["docs"]}
    negated = {d["doc_id"] for d in searcher.search(
        "history AND NOT culture", limit=1000, exp=False, page_rank=False,
        with_meta=False)["docs"]}
    with_term = {d["doc_id"] for d in searcher.search(
        "history AND culture", limit=1000, exp=False, page_rank=False,
        with_meta=False)["docs"]}
    assert negated and with_term
    assert negated == base - with_term


def test_standalone_not_matches_nothing(sidx):
    _, searcher, _ = sidx
    res = searcher.search("NOT Empire", limit=10, exp=False,
                          page_rank=False, with_meta=False)
    assert res["docs"] == []


def test_wildcard_expansion_matches_vocabulary(sidx):
    import fnmatch

    idx, _, oracle = sidx
    vocab = sorted({t for (f, t) in oracle.postings if f == "text"})
    for pat in ["rob*", "progr?m", "*ing", "w?r"]:
        want = [t for t in vocab if fnmatch.fnmatchcase(t, pat)]
        got = idx.expand_pattern("text", pat)
        assert got == want[: qs.MAX_PATTERN_TERMS], pat


def test_boost_changes_scores_consistently(sidx):
    idx, searcher, oracle = sidx
    plain = searcher.search("Roman Empire", limit=5, exp=False,
                            page_rank=False, with_meta=False)
    boosted = searcher.search("Roman^3 Empire", limit=5, exp=False,
                              page_rank=False, with_meta=False)
    assert plain["docs"] and boosted["docs"]
    # oracle agreement is covered above; here pin that boost=3 actually
    # moved the scores (not silently dropped)
    p = {d["doc_id"]: d["score"] for d in plain["docs"]}
    b = {d["doc_id"]: d["score"] for d in boosted["docs"]}
    common = set(p) & set(b)
    assert common and all(b[d] > p[d] for d in common)


# ---------------------------------------------------------------------------
# distributed paths agree with the driver kernel
# ---------------------------------------------------------------------------
def test_search_batch_handles_syntax(spark, sidx):
    idx, searcher, _ = sidx
    rows = search_batch(idx, SYNTAX_QUERIES, limit=10, exp=False,
                        page_rank=False).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, q in enumerate(SYNTAX_QUERIES):
        want = [d["doc_id"] for d in searcher.search(
            q, limit=10, exp=False, page_rank=False, with_meta=False
        )["docs"]]
        got = [d for _, d in sorted(by_q.get(qid, []))]
        assert got == want, q


def test_relational_referee_handles_syntax(spark, sidx):
    idx, searcher, _ = sidx
    # every syntax query whose negations are term-shaped (all but the
    # NOT-of-group form, which the referee declares unsupported)
    qs_ok = [q for q in SYNTAX_QUERIES if "NOT (" not in q]
    rows = search_batch_relational(idx, qs_ok, limit=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, q in enumerate(qs_ok):
        want = [d["doc_id"] for d in searcher.search(
            q, limit=10, exp=False, page_rank=False, with_meta=False
        )["docs"]]
        got = [d for _, d in sorted(by_q.get(qid, []))]
        assert got == want, q


def test_relational_referee_rejects_not_of_group(sidx):
    idx, _, _ = sidx
    with pytest.raises(NotImplementedError):
        search_batch_relational(idx, ["NOT (Roman Empire) Tuscany"],
                                limit=10)


def test_relational_referee_exp_not_refusal_is_per_query(sidx):
    """Exclusions and synonym branches only interact WITHIN one query:
    a batch where one query carries a NOT and a DIFFERENT query gains
    synonyms must run; NOT + synonyms in the same query must refuse."""
    from search_engine_wikipedia_spark.plans import expansion as expmod

    idx, _, _ = sidx

    class _TinyInv:  # only "join" expands — fully deterministic
        synsets = {"join": ("join.n.01",)}
        sense_lemmas = {"join.n.01": ("join", "merge")}
        glosses: dict = {}

        @staticmethod
        def wup(a, b):
            return 0.0

    expmod.use_inventory(_TinyInv())
    try:
        # cross-query NOT + synonyms: must evaluate, not refuse
        search_batch_relational(
            idx, ["history NOT Tuscany", "join Rome"], limit=5, exp=True
        ).collect()
        # same-query NOT + synonyms: genuinely ambiguous shape, refuses
        with pytest.raises(NotImplementedError):
            search_batch_relational(
                idx, ["join NOT Tuscany"], limit=5, exp=True)
    finally:
        expmod.use_inventory(None)


# ---------------------------------------------------------------------------
# Fuzz: the parser must never crash on arbitrary user input — the only
# permitted exception is the documented QuerySyntaxError (phrases,
# wildcard-without-index), and any returned tree must be well-formed.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


def _well_formed(node):
    if node is None or isinstance(node, Term):
        return True
    if isinstance(node, Not):
        return _well_formed(node.child)
    if isinstance(node, (And, Or)):
        return len(node.children) > 0 and all(
            _well_formed(c) for c in node.children
        )
    return False


_QUERY_ALPHABET = st.sampled_from(
    list("ab OR()AND NOT*?^:\"'0.5") + ["title:", "rome^2", "euro*"]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_QUERY_ALPHABET, max_size=12).map("".join),
       st.sampled_from(["AND", "OR"]))
def test_parser_never_crashes(text, group):
    def leaf(word):
        if word.is_pattern:
            raise qs.QuerySyntaxError("no index in fuzz harness")
        return Term(word.field or "text", word.text.lower(), word.boost)

    try:
        tree = qs.parse_syntax(text, group, leaf)
    except qs.QuerySyntaxError:
        return
    assert _well_formed(tree)


def test_one_batch_three_way_agreement(spark, sidx):
    """NOT and wildcard queries submitted together as ONE batch must
    agree across all three distributed paths — the WAND kernel batch
    (search_batch), the broadcast posting-cache plan
    (search_many_broadcast), and the relational referee — per (query,
    doc, score).  The per-query agreement above can't catch a batched
    path crossing wires between queries sharing one pruned scan."""
    idx, searcher, _ = sidx
    batch = [q for q in SYNTAX_QUERIES if "NOT (" not in q]
    assert any("NOT" in q for q in batch) and any(
        "*" in q or "?" in q for q in batch)

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
        return out

    wand = by_query(search_batch(idx, batch, limit=10, exp=False,
                                 page_rank=False).collect())
    bcast = by_query(search_many_broadcast(idx, batch,
                                           limit=10).collect())
    rel = by_query(search_batch_relational(idx, batch,
                                           limit=10).collect())
    # same protocol as wand_consistency: per (query, doc) with a 2e-6
    # tolerance — the paths sum float leaf scores in different orders,
    # so a doc on a rounding boundary may sit one ulp apart
    for qid, q in enumerate(batch):
        for other in (bcast, rel):
            assert set(wand.get(qid, {})) == set(other.get(qid, {})), q
            for d, s in wand.get(qid, {}).items():
                assert abs(s - other[qid][d]) <= 2e-6, (q, d)
