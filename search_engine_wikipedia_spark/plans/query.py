"""Query parsing, execution, PageRank blend, result assembly.

Re-derivation of the reference query lifecycle
(``indexing/searching/searcher.py:61-142``):

1. multifield parse: each whitespace token → ``(text:analyzed OR
   title:analyzed)`` with per-field boosts (MultifieldPlugin;
   ``searcher.py:53-55,:86``); tokens grouped by AND (default) or OR
   (``searcher.py:23-25,:87``); a token whose analysis is empty in a
   field (stopword) drops that field term, and the token disappears
   entirely if both analyses are empty (Whoosh qparser behavior),
2. optional expansion: ``( orig ) OR ( syn1 OR syn2 … )^0.5``
   (``queryExpansion.py:161-174``) — the 0.5 group boost multiplies the
   synonym term boosts,
3. top-k by the selected weighting model (BM25F default),
4. optional PageRank blend: for the k results only, ``mult =
   round(1 + (pr/max_pr_in_results)^4, 5)``, ``final = score·mult``,
   then a stable re-sort by final desc (``searcher.py:108-118,:123-142``,
   ``graph.py:178-211``).  NOTE the reference multiplies by the
   5-decimal-ROUNDED value from ``getRank(ids, 5)`` — reproduced here.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any as _tAny

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import term_bucket
from ..functions.textproc import analyze_text, analyze_title
from ..operators import wand
from ..operators.wand import (
    And, GlobalStats, Not, Or, PostingList, Scorer, Term, Weighting,
)
from ..sources import catalog
from . import expansion as expansion_mod
from . import qsyntax

BASE_URL = "https://en.wikipedia.org/wiki/"  # searcher.py:27
PR_ALPHA = 4  # graph.py:194
PR_ROUND = 5  # searcher.py:135


# ---------------------------------------------------------------------------
# Parser (Q1/Q2)
# ---------------------------------------------------------------------------
DEFAULT_ANALYZERS = {"text": analyze_text, "title": analyze_title}


def token_node(word: str, text_boost: float, title_boost: float,
               analyzers: dict | None = None) -> Or | None:
    """One query word → Or([text:analyzed, title:analyzed]) (multifield).

    ``analyzers`` = the index's recorded per-field chains (A3/A2 by
    default); a query MUST be analyzed with the same chain the index
    was built with or its terms never match the vocabulary."""
    az = analyzers or DEFAULT_ANALYZERS
    terms = []
    t_text = az["text"](word)
    t_title = az["title"](word)
    if t_text:
        terms.append(Term("text", t_text[0], text_boost))
    if t_title:
        terms.append(Term("title", t_title[0], title_boost))
    if not terms:
        return None
    return Or(terms)


def _syntax_leaf(word, text_boost: float, title_boost: float,
                 analyzers: dict | None, index):
    """qsyntax.Word → leaf node (analysis + multifield + wildcards)."""
    az = analyzers or DEFAULT_ANALYZERS
    if word.is_pattern:
        if index is None:
            raise qsyntax.QuerySyntaxError(
                f"wildcard query {word.text!r} needs an open index to "
                "expand against the vocabulary; pass index= to parse_query"
            )
        fields = ([word.field] if word.field in ("text", "title")
                  else ["text", "title"])
        leaves = []
        for f in fields:
            fb = text_boost if f == "text" else title_boost
            for t in index.expand_pattern(f, word.text.lower()):
                leaves.append(Term(f, t, word.boost * fb))
        if not leaves:
            return None
        return leaves[0] if len(leaves) == 1 else Or(leaves)
    if word.field == "id_page":
        # deviation (documented in qsyntax): the ID field isn't in our
        # postings, so this leaf matches nothing
        return Term("id_page", word.text, word.boost)
    if word.field is not None:
        toks = az[word.field](word.text)
        if not toks:
            return None
        fb = text_boost if word.field == "text" else title_boost
        return Term(word.field, toks[0], word.boost * fb)
    return token_node(word.text, text_boost * word.boost,
                      title_boost * word.boost, analyzers)


def parse_query(
    text: str,
    group: str = "AND",
    text_boost: float = 1.0,
    title_boost: float = 1.0,
    expand: bool = False,
    expander: expansion_mod.Expander | None = None,
    analyzers: dict | None = None,
    index=None,
):
    """→ (tree, expansion_tokens).

    Plain whitespace queries take the legacy multifield path; queries
    using Whoosh syntax (AND/OR/NOT, parens, ``field:``, ``^boost``,
    wildcards, quotes) route through ``plans.qsyntax`` — see its
    docstring for the exact supported surface and deviations.
    ``index`` (a ``SearchIndex``) is only needed for wildcard patterns,
    which expand against the built vocabulary.
    """
    exp_tokens: list[str] = []
    if expand:
        expander = expander or expansion_mod.Expander()
        exp_tokens = expander.expansion(text)

    if qsyntax.has_syntax(text):
        orig = qsyntax.parse_syntax(
            text, group,
            lambda w: _syntax_leaf(w, text_boost, title_boost,
                                   analyzers, index),
        )
    else:
        nodes = [token_node(w, text_boost, title_boost, analyzers)
                 for w in text.split()]
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            orig = None
        elif len(nodes) == 1:
            orig = nodes[0]
        else:
            orig = And(nodes) if group == "AND" else Or(nodes)

    if expand and exp_tokens:
        syn_nodes = [
            token_node(w, text_boost * 0.5, title_boost * 0.5, analyzers)
            for w in exp_tokens
        ]
        syn_nodes = [n for n in syn_nodes if n is not None]
        if syn_nodes:
            syn_group = Or(syn_nodes) if len(syn_nodes) > 1 else syn_nodes[0]
            orig = Or([orig, syn_group]) if orig is not None else syn_group
    return orig, exp_tokens


def tree_terms(node) -> list[Term]:
    if node is None:
        return []
    if isinstance(node, Term):
        return [node]
    if isinstance(node, Not):
        return tree_terms(node.child)
    out = []
    for c in node.children:
        out.extend(tree_terms(c))
    return out


# ---------------------------------------------------------------------------
# Index handle: loads the catalog tables, binds postings to query trees
# ---------------------------------------------------------------------------
POSTING_COLS = [
    "term", "field", "shard_id", "n_shards", "term_df", "df",
    "doc_ids", "tfs", "fls", "block_last", "block_max_tf", "block_min_fl",
    "block_doc_off", "block_tf_off", "block_fl_off",
]


@dataclass
class IndexStats:
    n_docs: int
    avg_len: dict


# Default driver-side posting-fetch cap (postings per term).  Memory
# math: a collected posting row is the delta+varbyte doc_id/tf/fl blobs
# (~2-4 bytes/posting compressed) plus Row overhead amortized across
# the ~128k-posting blocks, so 10M postings ≈ 30-80 MB of blobs and a
# comparable transient decode buffer — well inside any sane driver
# heap, while a web-scale head term (10^9+ postings, multi-GB) is
# refused before a single blob leaves parquet.  Opt OUT (uncapped)
# requires an explicit ``max_postings_per_term=None``.
DEFAULT_MAX_POSTINGS_PER_TERM = 10_000_000

# sentinel: distinguishes "caller said None = uncapped" from "caller
# said nothing = default cap", and lets tests monkeypatch the module
# default without re-binding the __init__ signature.  Typed ``Any`` so
# the ``int | None`` parameter annotations it defaults stay honest to
# type checkers (the resolved attribute is always int/float or None).
_CAP_DEFAULT: "_tAny" = object()


class HotTermError(ValueError):
    """A query term's posting list exceeds the driver-fetch cap; the
    query must run through the distributed ``search_batch`` plan."""


# Serving-path tombstone budget, as a fraction of indexed docs.  The
# driver-held tombstone set is bounded by COMPACTION CADENCE, not by
# any mechanism — the same reasoning Lucene applies to its live-docs
# bitset — and this constant turns that operator-discipline assumption
# into a contract: a reader that would hold more than this fraction of
# the corpus as int64 dead-ids refuses with "compact first" instead of
# silently ballooning driver memory and per-query exclusion cost.
# 0.5 mirrors Lucene's natural ceiling (beyond half-dead, a segment is
# pure waste); pass ``max_tombstone_frac=None`` to disable.
DEFAULT_MAX_TOMBSTONE_FRAC = 0.5


class TombstoneBudgetError(RuntimeError):
    """Un-compacted deletes exceed the serving budget; run
    ``ingest.compact`` before reopening readers."""


class SearchIndex:
    """Open a built index (reference ``openOrBuild`` read path).

    ``max_postings_per_term`` guards the driver-side posting fetch: at
    web scale a head term's blobs are GBs, and collecting them into the
    driver (the interactive/serving cache path) is a driver-OOM hazard.
    A cheap column-pruned pre-scan reads only ``term_df`` (the blob
    columns never leave parquet) and a term over the cap raises
    ``HotTermError`` with a pointer to the distributed ``search_batch``
    plan, which never collects postings.  The cap defaults ON
    (``DEFAULT_MAX_POSTINGS_PER_TERM``) so the unsafe collect requires
    an explicit ``max_postings_per_term=None`` opt-out.
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache_terms: bool = True,
                 max_postings_per_term: int | None = _CAP_DEFAULT,
                 max_tombstone_frac: float | None = _CAP_DEFAULT):
        from ..functions.textproc import ANALYZERS

        self.spark = spark
        self.index_dir = index_dir
        self.max_postings_per_term = (
            DEFAULT_MAX_POSTINGS_PER_TERM
            if max_postings_per_term is _CAP_DEFAULT
            else max_postings_per_term
        )
        self.max_tombstone_frac = (
            DEFAULT_MAX_TOMBSTONE_FRAC
            if max_tombstone_frac is _CAP_DEFAULT
            else max_tombstone_frac
        )
        # analyze queries with the chains the index was BUILT with
        # (recorded at build time; defaults = reference schema A3/A2)
        meta = catalog.read_schema_meta(index_dir)
        self.analyzer_names = meta
        self.analyzers = {
            "text": ANALYZERS[meta["text_analyzer"]],
            "title": ANALYZERS[meta["title_analyzer"]],
        }
        self.postings = catalog.read_table(spark, index_dir, "postings")
        fs = catalog.read_table(spark, index_dir, "field_stats").collect()
        n_docs = int(fs[0]["doc_count"])
        self.stats = GlobalStats(
            n_docs=n_docs,
            avg_len={r["field"]: (float(r["avg_len"]) or 1.0) for r in fs},
        )
        # Whoosh avg_field_length falls back to 1 when 0
        for k, v in self.stats.avg_len.items():
            if v == 0:
                self.stats.avg_len[k] = 1.0
        self._term_cache: dict = {} if cache_terms else None
        self._pagerank = None
        self._docs = None
        self._tombstones: "np.ndarray | None" = None
        # the bucket MODULUS comes from the recorded schema metadata;
        # counting tbucket= dirs (the legacy fallback) under-estimates
        # it when a sparse vocabulary leaves top buckets empty, which
        # would prune the wrong partitions
        self.n_term_buckets = (
            meta.get("n_term_buckets") or self._detect_buckets()
        )

    def _detect_buckets(self) -> int:  # legacy indexes without metadata
        import os
        root = catalog.table_path(self.index_dir, "postings")
        return max(
            (int(d.split("=")[1]) for d in os.listdir(root)
             if d.startswith("tbucket=")),
            default=0,
        ) + 1

    # -- postings fetch ------------------------------------------------------
    def fetch_postings(self, keys: list[tuple[str, str]]) -> dict:
        """(field, term) → PostingList, one pruned parquet scan.

        Partition pruning: the scan is filtered to the xxhash-buckets of
        the requested terms, then to the term/field values (both reach
        the parquet reader as pushed filters).
        """
        missing = [k for k in keys
                   if self._term_cache is None or k not in self._term_cache]
        out = {}
        if missing:
            terms = sorted({t for _, t in missing})
            fields = sorted({f for f, _ in missing})
            cond = F.col("term").isin(terms) & F.col("field").isin(fields)
            if self.n_term_buckets:
                # buckets computed driver-side (functions/hashing.py
                # XXH64 parity with F.xxhash64) — a throwaway Spark job
                # here would add a scheduling round-trip per search
                buckets = sorted(
                    {term_bucket(t, self.n_term_buckets) for t in terms}
                )
                cond = F.col("tbucket").isin(buckets) & cond
            if self.max_postings_per_term is not None:
                # column-pruned pre-check: reads term_df only, no blobs
                heavy = (
                    self.postings.where(cond)
                    .select("field", "term", "term_df").distinct()
                    .where(F.col("term_df") > self.max_postings_per_term)
                    .collect()
                )
                if heavy:
                    worst = max(heavy, key=lambda r: r["term_df"])
                    raise HotTermError(
                        f"term {worst['field']}:{worst['term']!r} has "
                        f"{worst['term_df']} postings > cap "
                        f"{self.max_postings_per_term}; route this query "
                        "through the distributed search_batch plan instead "
                        "of the driver posting cache"
                    )
            rows = self.postings.where(cond).select(*POSTING_COLS).collect()
            grouped: dict = {}
            for r in rows:
                grouped.setdefault((r["field"], r["term"]), []).append(r)
            for k in missing:
                pl = PostingList.from_rows(k[0], k[1], grouped.get(k, []))
                if self._term_cache is not None:
                    self._term_cache[k] = pl
                out[k] = pl
        if self._term_cache is not None:
            for k in keys:
                out[k] = self._term_cache[k]
        return out

    def bind(self, tree) -> None:
        terms = [t for t in tree_terms(tree) if t.field in ("text", "title")]
        plists = self.fetch_postings([(t.field, t.text) for t in terms])
        for t in terms:
            t.plist = plists[(t.field, t.text)]

    def expand_pattern(self, field: str, pattern: str,
                       cap: int = qsyntax.MAX_PATTERN_TERMS) -> list[str]:
        """Vocabulary terms matching a Whoosh wildcard ``pattern``.

        A column-pruned dictionary scan over the postings table: only
        the (field, term) columns leave parquet (no blobs), the literal
        prefix before the first wildcard is pushed down as a
        ``StartsWith`` filter (prunes row groups on the term-sorted
        shards), and the full anchored regex runs JVM-side.  tbucket
        partition pruning can't apply (the bucket is a hash of the
        whole term) — acceptable: this is a dictionary scan, not a
        postings scan.  Deterministic: term-sorted, capped at ``cap``.
        """
        base = self.postings.select("term").where(F.col("field") == field)
        prefix = qsyntax.pattern_prefix(pattern)
        if prefix:
            base = base.where(F.col("term").startswith(prefix))
        rows = (
            base.where(F.col("term").rlike(qsyntax.pattern_regex(pattern)))
            .distinct().orderBy("term").limit(cap).collect()
        )
        return [r["term"] for r in rows]

    # -- tombstones (deletes since the last compaction) -------------------
    @property
    def tombstones(self) -> np.ndarray:
        """Sorted doc_ids deleted but not yet compacted away.

        Cached after the first read (serving-path searches must not pay
        a Spark job each); a writer that deletes calls
        ``refresh_tombstones()`` on its readers — or just reopens the
        index.  Driver-held by design: the set is bounded by compaction
        cadence (``ingest.compact`` empties it), the same reasoning
        Lucene uses for its live-docs bitset."""
        if self._tombstones is None:
            if not catalog.table_exists(self.index_dir, "tombstones"):
                # covers both "never deleted" and a parquet-less dir
                # left by a crash (ingest.recover_incomplete cleans
                # those, but serving must not depend on a writer having
                # run since the crash)
                self._tombstones = np.empty(0, dtype=np.int64)
            elif catalog.iceberg_enabled(self.spark):
                rows = catalog.read_table(
                    self.spark, self.index_dir, "tombstones"
                ).select("doc_id").collect()
                self._tombstones = np.sort(
                    np.array([r["doc_id"] for r in rows], dtype=np.int64)
                )
            else:
                # serving path: pyarrow footer-to-driver read, no Spark
                # job on index open
                arr = catalog.read_table_arrow(
                    self.index_dir, "tombstones", ["doc_id"]
                )["doc_id"].to_numpy(zero_copy_only=False)
                self._tombstones = np.sort(arr.astype(np.int64))
            if self.max_tombstone_frac is not None:
                frac = self._tombstones.size / max(1, self.stats.n_docs)
                if frac > self.max_tombstone_frac:
                    n = self._tombstones.size
                    self._tombstones = None  # don't cache a refusal
                    raise TombstoneBudgetError(
                        f"{n} un-compacted tombstones = {frac:.0%} of "
                        f"{self.stats.n_docs} indexed docs, over the "
                        f"serving budget max_tombstone_frac="
                        f"{self.max_tombstone_frac}; run ingest.compact"
                        f"() on {self.index_dir!r} (or open with "
                        "max_tombstone_frac=None to override)"
                    )
        return self._tombstones

    def refresh_tombstones(self) -> None:
        self._tombstones = None

    # -- auxiliary tables ------------------------------------------------
    def pagerank_for(self, doc_ids: list[int]) -> dict[int, float]:
        if self._pagerank is None:
            path = catalog.table_path(self.index_dir, "pagerank")
            import os
            if not os.path.exists(path):
                return {}
            self._pagerank = catalog.read_table(
                self.spark, self.index_dir, "pagerank")
        rows = self._pagerank.where(
            F.col("doc_id").isin([int(d) for d in doc_ids])
        ).collect()
        return {int(r["doc_id"]): float(r["pr"]) for r in rows}

    def doc_meta(self, doc_ids: list[int]) -> dict[int, dict]:
        if self._docs is None:
            self._docs = catalog.read_table(self.spark, self.index_dir, "docs")
        rows = (
            self._docs.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
            .select("doc_id", "url", "title", "clean_text").collect()
        )
        return {int(r["doc_id"]): r.asDict() for r in rows}


# ---------------------------------------------------------------------------
# PageRank blend (Q7) — shared by driver & batched paths
# ---------------------------------------------------------------------------
def blend_pagerank(doc_ids, scores, pr_map: dict[int, float]):
    """Reference __combinedScore + getRank semantics on the top-k rows.

    mult(doc) = round(1 + (pr/max_rel)^alpha, 5); missing doc → raw 1
    (searcher.py:139 ``values_page_rank.get(id, 1)``); final =
    score · mult; stable re-sort by final desc keeps the BM25
    (score desc, doc asc) order for ties (python ``sorted`` is stable,
    searcher.py:110).
    Returns (order, final_scores, mult_values).
    """
    n = len(doc_ids)
    if n == 0:
        return np.arange(0), np.asarray(scores), {}
    prs = [pr_map.get(int(d)) for d in doc_ids]
    present = [p for p in prs if p is not None]
    mults = np.ones(n, dtype=np.float64)
    mult_map = {}
    if present:
        max_rel = max(present)
        for i, (d, p) in enumerate(zip(doc_ids, prs)):
            if p is not None:
                normalized = p / max_rel if max_rel else 0.0
                m = round(1.0 + normalized ** PR_ALPHA, PR_ROUND)
                mults[i] = m
                mult_map[int(d)] = m
    final = np.asarray(scores, dtype=np.float64) * mults
    order = np.argsort(-final, kind="stable")
    return order, final, mult_map


# ---------------------------------------------------------------------------
# Searcher (interactive, driver-side kernel)
# ---------------------------------------------------------------------------
class WikiSearcher:
    """Reference ``WikiSearcher.search`` surface (searcher.py:61-120)."""

    def __init__(self, index: SearchIndex,
                 expander: expansion_mod.Expander | None = None):
        self.index = index
        self.expander = expander or expansion_mod.Expander()

    def search(
        self,
        text: str,
        limit: int = 10,
        exp: bool = True,
        page_rank: bool = True,
        text_boost: float = 1.0,
        title_boost: float = 1.0,
        weighting: str = Weighting.BM25F,
        group: str = "AND",
        with_meta: bool = True,
    ) -> dict:
        t0 = time.perf_counter()
        tree, exp_tokens = parse_query(
            text, group=group, text_boost=text_boost,
            title_boost=title_boost, expand=exp, expander=self.expander,
            analyzers=self.index.analyzers, index=self.index,
        )
        if tree is None:
            return {"time_second": 0.0, "expanded": exp_tokens if exp else [],
                    "n_res": 0, "docs": []}
        self.index.bind(tree)
        scorer = Scorer(self.index.stats, model=weighting,
                        exclude=self.index.tombstones)
        doc_ids, scores, n_res = scorer.topk(tree, limit)
        runtime = time.perf_counter() - t0

        pr_map = self.index.pagerank_for(doc_ids.tolist()) if page_rank else {}
        order, final, mult_map = blend_pagerank(doc_ids, scores, pr_map) \
            if page_rank else (np.arange(doc_ids.size), scores, {})

        docs_out = []
        meta = self.index.doc_meta(doc_ids.tolist()) if with_meta else {}
        q_tokens = [t.text for t in tree_terms(tree) if t.field == "text"]
        for i in order:
            d = int(doc_ids[i])
            m = meta.get(d, {})
            docs_out.append({
                "doc_id": d,
                "link": m.get("url", BASE_URL),
                "title": m.get("title", ""),
                "highlight": make_highlight(
                    m.get("clean_text", ""), q_tokens,
                    transform=_hl_transform(
                        self.index.analyzer_names["text_analyzer"]),
                ) if with_meta else "",
                "final_score": float(final[i]),
                "score": float(scores[i]),
                # searcher.py:117: rounded multiplier, or -1 if absent
                "page_rank": mult_map.get(d, -1) if page_rank else "Disabled",
            })
        return {
            "time_second": runtime,
            "expanded": exp_tokens if exp else [],
            "n_res": int(n_res),
            "docs": docs_out,
        }


# ---------------------------------------------------------------------------
# Highlights (Q8) — Whoosh-faithful fragmenter / scorer / formatter.
#
# Re-derivation of the public Whoosh 2.7.4 highlight pipeline invoked by
# the reference as ``result.highlights("text", top=2)`` (searcher.py:115)
# with the default ``Highlighter``: ContextFragmenter(maxchars=200,
# surround=20), BasicFragmentScorer, HtmlFormatter(tagname="b",
# between="..."), order=FIRST (fragments re-sorted by start position
# after top-N selection), minscore=1.  The stored field text is
# retokenized with the field's analyzer chain (A3 for "text": tokenize,
# lowercase, stop/minsize filter, Porter stem) keeping character
# offsets; a token "matches" when its analyzed text is one of the
# query's stemmed terms for the field.
# ---------------------------------------------------------------------------
HL_MAXCHARS = 200        # ContextFragmenter default
HL_SURROUND = 20
HL_CHARLIMIT = 2 ** 15   # whoosh DEFAULT_CHARLIMIT
HL_MAXCLASSES = 5        # HtmlFormatter default


@dataclass
class Fragment:
    """A candidate snippet: char range + the analyzed tokens inside."""

    startchar: int
    endchar: int
    tokens: list          # [(stemmed_text, start, end, matched)]

    @property
    def matches(self):
        return [t for t in self.tokens if t[3]]

    @property
    def matched_terms(self):
        return frozenset(t[0] for t in self.matches)


def _hl_transform(analyzer_name: str):
    """Per-token transform of the text-field analyzer chain, for the
    highlighter's retokenize pass (tokenize/lower/stop are shared)."""
    from ..functions.porter import stem as _stem
    from ..functions.textproc import fold_accents, lemmatize_noun

    return {
        "text": _stem,
        "text_accent": lambda t: fold_accents(_stem(t)),
        "text_lemma": lemmatize_noun,
    }.get(analyzer_name, lambda t: t)


def _analyze_with_chars(text: str, charlimit: int = HL_CHARLIMIT,
                        transform=None):
    """Text-field analyzer over ``text`` with char offsets (retokenize
    mode); ``transform`` is the chain's per-token tail (Porter stem for
    the default A3)."""
    from ..functions.porter import stem as _stem
    from ..functions.textproc import MIN_TOKEN_SIZE, STOP_WORDS, TOKEN_PATTERN

    transform = transform or _stem
    for m in TOKEN_PATTERN.finditer(text):
        if charlimit and m.end() > charlimit:
            return
        tok = m.group(0).lower()
        if len(tok) >= MIN_TOKEN_SIZE and tok not in STOP_WORDS:
            yield transform(tok), m.start(), m.end()


def context_fragments(text: str, matched_terms: set,
                      maxchars: int = HL_MAXCHARS,
                      surround: int = HL_SURROUND,
                      transform=None) -> list[Fragment]:
    """Whoosh ContextFragmenter.fragment_tokens: a sliding token window
    keeps ≤``surround`` chars of *token* text before a hit; a hit opens
    a countdown of ``surround`` (plus any unused before-context) chars
    after it; the fragment closes when the countdown expires or the
    window reaches ``maxchars``.  Lengths count analyzed-token chars
    only (whitespace between tokens is free), exactly as Whoosh does.
    """
    out: list[Fragment] = []
    current: list = []
    currentlen = 0
    countdown = -1

    def close():
        frag_tokens = list(current)
        start = max(0, frag_tokens[0][1] - surround)
        end = min(len(text), frag_tokens[-1][2] + surround)
        out.append(Fragment(start, end, [
            (tt, ts, te, tt in matched_terms) for tt, ts, te in frag_tokens
        ]))

    for tt, ts, te in _analyze_with_chars(text, transform=transform):
        if tt in matched_terms:
            countdown = surround
            # unused before-context rolls into the after-countdown
            countdown += max(0, surround - currentlen)
        current.append((tt, ts, te))
        length = te - ts
        currentlen += length
        if countdown >= 0:
            countdown -= length
            if countdown < 0 or currentlen >= maxchars:
                close()
                current = []
                currentlen = 0
                countdown = -1
        else:
            while current and currentlen > surround:
                old = current.pop(0)
                currentlen -= old[2] - old[1]
    if countdown >= 0 and current:
        close()
    return out


def basic_fragment_score(frag: Fragment) -> float:
    """Whoosh BasicFragmentScorer: Σ matched-token boosts (1.0 here),
    multiplied by 100 × |distinct matched terms| to favor diversity."""
    score = float(len(frag.matches))
    score *= (len(frag.matched_terms) * 100) or 1
    return score


def html_format(text: str, frags: list[Fragment], tagname: str = "b",
                between: str = "...") -> str:
    """Whoosh HtmlFormatter: matched tokens wrapped as
    ``<b class="match termN">orig</b>``, fragments joined by ``...``.

    Parity details (whoosh/highlight.py HtmlFormatter._format_fragment):
    ``seen`` is keyed on the ANALYZED token text (``t.text``), so
    stem-equal surface variants ('runs'/'running') share one termN
    class; both the matched token surface and the inter-match text are
    html-escaped (cgi.escape semantics: ``& < >`` only, quotes left)."""
    from html import escape

    seen: dict[str, int] = {}
    parts = []
    for f in frags:
        index = f.startchar
        buf = []
        for tt, ts, te, matched in f.tokens:
            if not matched:
                continue
            orig = escape(text[ts:te], quote=False)
            if tt in seen:
                termnum = seen[tt]
            else:
                termnum = len(seen) % HL_MAXCLASSES
                seen[tt] = termnum
            buf.append(escape(text[index:ts], quote=False))
            buf.append(
                f'<{tagname} class="match term{termnum}">{orig}</{tagname}>'
            )
            index = te
        buf.append(escape(text[index:f.endchar], quote=False))
        parts.append("".join(buf))
    return between.join(parts)


def make_highlight(clean_text: str, stemmed_terms: list[str],
                   top: int = 2, minscore: float = 1.0,
                   transform=None) -> str:
    """``result.highlights("text", top=2)`` semantics end-to-end:
    fragment → score → take top-``top`` with score ≥ ``minscore`` →
    re-sort by position (order=FIRST) → HTML-format joined by '...'.
    ``transform`` = the index text analyzer's per-token tail (see
    ``_hl_transform``) so non-default schemas highlight correctly."""
    if not clean_text or not stemmed_terms:
        return ""
    frags = context_fragments(clean_text, set(stemmed_terms),
                              transform=transform)
    scored = sorted(
        ((basic_fragment_score(f), f) for f in frags),
        key=lambda sf: (-sf[0], sf[1].startchar),
    )[:top]
    best = [f for s, f in scored if s >= minscore]
    best.sort(key=lambda f: f.startchar)
    return html_format(clean_text, best)


# ---------------------------------------------------------------------------
# Batched query evaluation — one distributed job for a query set
# ---------------------------------------------------------------------------
def search_batch(
    index: SearchIndex,
    queries: list[str],
    limit: int = 10,
    exp: bool = True,
    page_rank: bool = True,
    group: str = "AND",
    weighting: str = Weighting.BM25F,
) -> DataFrame:
    """Evaluate many queries in ONE Spark job (the scalable path).

    Plan: build each query's tree on the driver (tiny), ship the
    (query, field, term) fan-out as a DataFrame, join it against the
    term-partitioned postings (broadcast the fan-out side — it is a few
    hundred rows), then ``groupBy(query_id).applyInPandas`` runs the
    same block-max kernel per query with only that query's postings.
    Returns (query_id, query, rank, doc_id, score, final_score).
    """
    spark = index.spark
    trees = {}
    fanout_rows = []
    for qid, q in enumerate(queries):
        tree, _ = parse_query(q, group=group, expand=exp,
                              analyzers=index.analyzers, index=index)
        trees[qid] = (q, tree)
        for t in tree_terms(tree) if tree is not None else []:
            fanout_rows.append((qid, t.field, t.text))
    fan = spark.createDataFrame(
        fanout_rows, "query_id int, field string, term string"
    )
    # scan pruning: a broadcast join does NOT push the probe-side term
    # values into the parquet reader, so without the explicit isin()
    # filters the join scans the ENTIRE postings table per batch.  The
    # batch vocabulary is known on the driver — push it as (tbucket
    # partition pruning + term/field row-group filters), same as the
    # interactive fetch_postings path; the scan then touches only the
    # matched terms' buckets.
    postings = index.postings
    all_terms = sorted({t for _, _, t in fanout_rows})
    all_fields = sorted({f for _, f, _ in fanout_rows})
    if fanout_rows:
        cond = (F.col("term").isin(all_terms)
                & F.col("field").isin(all_fields))
        if index.n_term_buckets:
            buckets = sorted(
                {term_bucket(t, index.n_term_buckets) for t in all_terms}
            )
            cond = F.col("tbucket").isin(buckets) & cond
        postings = postings.where(cond)
    joined = postings.join(
        F.broadcast(fan), ["field", "term"], "inner"
    ).select("query_id", *POSTING_COLS)

    stats = index.stats
    trees_b = spark.sparkContext.broadcast(
        {qid: (q, _tree_spec(tree)) for qid, (q, tree) in trees.items()}
    )
    # tombstones ride one broadcast to every kernel task (tiny between
    # compactions; compact() empties the table)
    tomb_b = spark.sparkContext.broadcast(index.tombstones)

    out_schema = (
        "query_id int, query string, rank int, doc_id long, "
        "score double, n_res long"
    )

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iat[0])
        q, spec = trees_b.value[qid]
        tree = _tree_from_spec(spec)
        rows_by_key: dict = {}
        for r in pdf.to_dict("records"):
            rows_by_key.setdefault((r["field"], r["term"]), []).append(r)
        for t in tree_terms(tree):
            t.plist = PostingList.from_rows(
                t.field, t.text, rows_by_key.get((t.field, t.text), [])
            )
        scorer = Scorer(stats, model=weighting, exclude=tomb_b.value)
        doc_ids, scores, n_res = scorer.topk(tree, limit)
        return pd.DataFrame({
            "query_id": qid,
            "query": q,
            "rank": np.arange(1, doc_ids.size + 1, dtype=np.int32),
            "doc_id": doc_ids.astype(np.int64),
            "score": scores,
            "n_res": np.int64(n_res),
        })

    # explicit exchange: groupBy().applyInPandas inserts a hash
    # partitioning that AQE coalesces by BYTE size — posting blobs for a
    # query batch are few MB, so the whole batch would collapse into ONE
    # task and the per-query WAND kernels would run serially.  A user
    # repartition is never coalesced; the groupBy below reuses it (no
    # second exchange).  Partition count = min(|Q|, cores): one kernel
    # per task at full parallelism without empty-partition overhead.
    n_kernel_parts = max(1, min(len(queries),
                                spark.sparkContext.defaultParallelism))
    results = (
        joined.repartition(n_kernel_parts, "query_id")
        .groupBy("query_id").applyInPandas(run_query, schema=out_schema)
    )

    if not page_rank:
        return results.withColumn("final_score", F.col("score"))

    # blend: broadcast-join the k·|Q| result rows with pagerank, window
    # max over each query's candidates, rounded multiplier, re-rank.
    import os
    pr_path = catalog.table_path(index.index_dir, "pagerank")
    if not os.path.exists(pr_path):
        return results.withColumn("final_score", F.col("score"))
    pr = catalog.read_table(spark, index.index_dir, "pagerank")
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id")
    # Two-step lookup so the corpus-sized pagerank table is never
    # broadcast (one row per document — OOM at 10^12 docs) and never
    # shuffled: (1) inner-join pr against the tiny k·|Q| candidate-id
    # set with the TINY side hinted (inner joins may build either
    # side, so this streams pr once), then (2) left-join the now
    # ≤k·|Q|-row pr subset back onto results.  A single outer join
    # can't do this: BroadcastHashJoin must build the non-preserved
    # side, which here is the corpus-sized one.
    # results (the WAND-kernel output) now feeds two consumers — the
    # id set and the final join — so materialize it once.
    # localCheckpoint, NOT persist(): a SQL persist registers the plan
    # in the session CacheManager, which holds the storage blocks until
    # an explicit unpersist()/clearCache() — the ContextCleaner does
    # not reclaim SQL cache entries on GC, so every page_rank=True
    # batch in a long-lived serving session would leak executor
    # storage.  localCheckpoint's RDD blocks ARE ContextCleaner-
    # reclaimed when the DataFrame is GC'd (same pattern as
    # ingest.delete_urls), and eager=True runs the Python kernels
    # exactly once.  Tradeoff: checkpointing truncates lineage, so on
    # a real cluster an executor lost while holding these blocks fails
    # the batch instead of recomputing — acceptable for a retryable
    # serving query, where the alternative (persist) leaks storage
    # across a long-lived session.
    results = results.localCheckpoint()
    pr_hits = pr.join(
        F.broadcast(results.select("doc_id").distinct()), "doc_id")
    blended = (
        results.join(F.broadcast(pr_hits), "doc_id", "left")
        .withColumn("max_rel", F.max("pr").over(w))
        .withColumn(
            "mult",
            F.when(
                F.col("pr").isNotNull(),
                F.round(
                    F.lit(1.0) + F.pow(F.col("pr") / F.col("max_rel"),
                                       F.lit(float(PR_ALPHA))),
                    PR_ROUND,
                ),
            ).otherwise(F.lit(1.0)),
        )
        .withColumn("final_score", F.col("score") * F.col("mult"))
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("final_score"), F.asc("rank")
    )
    return (
        blended.withColumn("final_rank", F.row_number().over(w2))
        .drop("pr", "max_rel")
    )


def search_batch_relational(
    index: SearchIndex,
    queries: list[str],
    limit: int = 10,
    group: str = "AND",
    exp: bool = False,
) -> DataFrame:
    """BM25F top-k computed WITHOUT the WAND kernel or the codec: a
    pure relational plan over the index's ``term_freqs`` /
    ``field_stats`` tables — an independent referee for the block-max
    engine path (same parse, same Whoosh scoring formula, same
    tie-break), used by the ``wand_consistency`` driver query.

    Semantics mirror the Scorer: each query token is an OR group over
    its (text:stemmed, title:token) leaves; AND requires every group
    matched; a doc's score sums every matched leaf.  Ranking uses
    (raw score desc, doc asc) — the kernel's tie order; exact ties
    have identical leaf sets so both paths agree on the break.

    ``exp=True`` mirrors the expansion tree ``Or([And(groups), syn])``:
    synonym leaves (boost 0.5) join the fan-out UNGATED
    (group_id = -1).  Under AND, a doc scores
    ``(all groups matched ? Σ main leaves : 0) + Σ matched syn
    leaves`` and qualifies if either side matched — exactly Whoosh's
    sum-of-matched-children for that tree shape.  Under OR the tree is
    flat, so syn leaves are simply more leaves.  NOT + expansion is
    refused: the kernel's Not only guards the And branch while this
    referee's anti-join is global, so the shapes genuinely differ.
    """
    spark = index.spark
    fan_rows = []
    neg_rows = []  # (query_id, field, term): any-match exclusion
    n_groups = {}
    syn_qids = set()
    expander = expansion_mod.Expander() if exp else None
    for qid, q in enumerate(queries):
        tree, _ = parse_query(q, group=group, expand=False,
                              analyzers=index.analyzers, index=index)
        if exp:
            # same construction as parse_query(expand=True): synonym
            # token_nodes at half boost, joined as an ungated branch
            for w in expander.expansion(q):
                node = token_node(w, 0.5, 0.5, index.analyzers)
                for t in tree_terms(node):
                    fan_rows.append((qid, -1, t.field, t.text,
                                     float(t.boost)))
                    syn_qids.add(qid)
        if tree is None:
            n_groups[qid] = 0
            continue
        groups = tree.children if isinstance(tree, And) else [tree]
        pos_groups = []
        for g in groups:
            if isinstance(g, Not):
                # supported negation shapes: Term or Or-of-Terms — the
                # kernel's any-leaf-matches semantics map to a per-term
                # anti-join.  (NOT of an And-group has no relational
                # twin here; the kernel path still evaluates it.)
                ch = g.child
                leaves = ch.children if isinstance(ch, Or) else [ch]
                if not all(isinstance(c, Term) for c in leaves):
                    raise NotImplementedError(
                        "relational referee supports NOT only over a "
                        "term / multifield term group"
                    )
                for t in leaves:
                    neg_rows.append((qid, t.field, t.text))
            else:
                if group != "AND" and any(
                    isinstance(t, Not) for t in getattr(g, "children", [])
                ):
                    raise NotImplementedError(
                        "relational referee: NOT inside an OR group"
                    )
                pos_groups.append(g)
        n_groups[qid] = len(pos_groups) if group == "AND" else 1
        for gi, g in enumerate(pos_groups):
            for t in tree_terms(g):
                fan_rows.append((qid, gi, t.field, t.text, float(t.boost)))
    # exclusions and synonym branches only interact WITHIN one query:
    # refuse a query that has both, not a batch where different
    # queries happen to contribute one each
    neg_qids = {qid for qid, _, _ in neg_rows}
    if exp and neg_qids & syn_qids:
        raise NotImplementedError(
            "relational referee: NOT combined with expansion in the "
            "same query — the kernel's Not guards only the original "
            "And branch, this referee's exclusion is per-query-global; "
            "shapes differ"
        )
    fan = spark.createDataFrame(
        fan_rows,
        "query_id int, group_id int, field string, term string, boost double",
    )
    # a query whose original tree vanished (all tokens stopworded) can
    # still rank via its synonym branch: keep it with n_groups=0, the
    # AND gate (0 matched == 0 needed) then passes its main side
    need = spark.createDataFrame(
        [(qid, n) for qid, n in n_groups.items()
         if n > 0 or qid in syn_qids],
        "query_id int, n_groups int",
    )
    tf = catalog.read_table(spark, index.index_dir, "term_freqs")
    df_t = (
        tf.join(F.broadcast(fan.select("field", "term").distinct()),
                ["field", "term"])
        .groupBy("field", "term").agg(F.count("*").alias("df"))
    )
    stats = index.stats
    avg_map = spark.createDataFrame(
        [(f, float(v)) for f, v in stats.avg_len.items()],
        "field string, avgfl double",
    )
    k1, b = wand.K1, wand.B
    leaf = (
        tf.join(F.broadcast(fan), ["field", "term"])
        .join(F.broadcast(df_t), ["field", "term"])
        .join(F.broadcast(avg_map), "field")
        .withColumn(
            "idf",
            F.log(F.lit(float(stats.n_docs)) / (F.col("df") + 1)) + F.lit(1.0),
        )
        .withColumn("w", F.col("tf") * F.col("boost"))
        .withColumn(
            "leaf_score",
            F.col("idf") * F.col("w") * F.lit(k1 + 1.0)
            / (F.col("w") + F.lit(k1)
               * (F.lit(1.0 - b) + F.lit(b) * F.col("fl") / F.col("avgfl"))),
        )
    )
    scored = (
        leaf.groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.when(F.col("group_id") >= 0, F.col("leaf_score"))
                  .otherwise(0.0)).alias("main_score"),
            F.sum(F.when(F.col("group_id") < 0, F.col("leaf_score"))
                  .otherwise(0.0)).alias("syn_score"),
            F.count_distinct(
                F.when(F.col("group_id") >= 0, F.col("group_id"))
            ).alias("g_matched"),
            F.max(F.when(F.col("group_id") < 0, 1).otherwise(0))
            .alias("syn_matched"),
        )
        .join(F.broadcast(need), "query_id")
    )
    if group == "AND":
        # Or([And(groups), syn]): the And branch contributes only when
        # complete; the syn branch contributes whenever matched
        scored = (
            scored
            .withColumn("main_ok",
                        F.col("g_matched") == F.col("n_groups"))
            .where(F.col("main_ok") | (F.col("syn_matched") == 1))
            .withColumn(
                "score",
                F.when(F.col("main_ok"), F.col("main_score"))
                .otherwise(F.lit(0.0)) + F.col("syn_score"),
            )
        )
    else:
        # flat Or: every matched leaf sums, any match qualifies
        scored = scored.withColumn(
            "score", F.col("main_score") + F.col("syn_score"))
    if neg_rows:
        negfan = spark.createDataFrame(
            neg_rows, "query_id int, field string, term string"
        )
        excl = (
            tf.join(F.broadcast(negfan), ["field", "term"])
            .select("query_id", "doc_id").distinct()
        )
        scored = scored.join(excl, ["query_id", "doc_id"], "left_anti")
    # tombstoned (deleted, not yet compacted) docs never rank — same
    # live-docs filter the kernel applies, so the referee stays a twin
    tomb = index.tombstones
    if tomb.size:
        scored = scored.where(~F.col("doc_id").isin(
            [int(d) for d in tomb]))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
        .select("query_id", "rank", "doc_id",
                F.round("score", 6).alias("score"))
    )


def search_many_broadcast(
    index: SearchIndex,
    queries: list[str],
    limit: int = 10,
    group: str = "AND",
    weighting: str = Weighting.BM25F,
    slices_per_core: int = 4,
    exp: bool = False,
) -> DataFrame:
    """Serve a query workload against a BROADCAST posting cache.

    The right plan when queries repeat or share a compact hot-term set
    (the common serving regime): ``search_batch``'s join would ship one
    copy of every matched posting blob PER QUERY through the shuffle,
    while here each executor receives the distinct blobs exactly once
    (torrent broadcast) and queries parallelize as cheap tasks over
    them.  Falls back to ``search_batch`` semantics — results are
    rank-identical.
    """
    spark = index.spark
    # parse each DISTINCT query text once (serving workloads repeat
    # queries; re-parsing per occurrence is pure driver-side constant
    # cost inside the timed region)
    specs: dict[str, tuple] = {}
    keys = set()
    for q in queries:
        if q in specs:
            continue
        tree, _ = parse_query(q, group=group, expand=exp,
                              analyzers=index.analyzers, index=index)
        specs[q] = _tree_spec(tree)
        for t in tree_terms(tree) if tree is not None else []:
            keys.add((t.field, t.text))
    trees = {qid: (q, specs[q]) for qid, q in enumerate(queries)}
    plists = index.fetch_postings(sorted(keys))  # ONE pruned scan
    # Pre-decode ONCE on the driver so every executor worker unpickles
    # ready numpy arrays instead of re-running the VB decode per
    # process (and so per-query lookups skip block decoding entirely).
    # Blobs are kept when the index term cache shares these objects
    # (strip only private copies).
    for pl in plists.values():
        if pl is not None:
            pl.prepare()
    b_plists = spark.sparkContext.broadcast(plists)
    b_trees = spark.sparkContext.broadcast(trees)
    b_tomb = spark.sparkContext.broadcast(index.tombstones)
    stats = index.stats

    n_slices = max(
        1, slices_per_core * spark.sparkContext.defaultParallelism
    )

    def run(qids):
        out = []
        for qid in qids:
            q, spec = b_trees.value[qid]
            tree = _tree_from_spec(spec)
            if tree is None:
                continue
            for t in tree_terms(tree):
                t.plist = b_plists.value[(t.field, t.text)]
            scorer = Scorer(stats, model=weighting, exclude=b_tomb.value)
            doc_ids, scores, n_res = scorer.topk(tree, limit)
            for r, (d, s) in enumerate(zip(doc_ids, scores), 1):
                out.append((qid, q, r, int(d), float(s), int(n_res)))
        return out

    rows = (
        spark.sparkContext
        .parallelize(list(trees), numSlices=n_slices)
        .mapPartitions(run)
    )
    return spark.createDataFrame(
        rows,
        "query_id int, query string, rank int, doc_id long, "
        "score double, n_res long",
    )


def serving_partition_stats(
    index: SearchIndex,
    queries: list[str],
    limit: int = 10,
    group: str = "AND",
    weighting: str = Weighting.BM25F,
    slices_per_core: int = 4,
    exp: bool = False,
) -> list[dict]:
    """Per-PARTITION serving metrics: run the broadcast serving plan
    (same kernels, same slicing as ``search_many_broadcast``) and
    return one row per task partition — ``partition_id``, queries
    evaluated, kernel seconds, queries/sec.  The north rule's
    "queries/sec served emitted per partition": a skewed slice (one
    pathological query dominating a task) shows up here as a
    queries_per_sec outlier, the serving twin of
    ``metrics.skew_report``.  Driver-side list — bounded by task count.
    """
    import time as _time

    spark = index.spark
    specs: dict[str, tuple] = {}
    keys = set()
    for q in queries:
        if q in specs:
            continue
        tree, _ = parse_query(q, group=group, expand=exp,
                              analyzers=index.analyzers, index=index)
        specs[q] = _tree_spec(tree)
        for t in tree_terms(tree) if tree is not None else []:
            keys.add((t.field, t.text))
    trees = {qid: (q, specs[q]) for qid, q in enumerate(queries)}
    plists = index.fetch_postings(sorted(keys))
    for pl in plists.values():
        if pl is not None:
            pl.prepare()
    b_plists = spark.sparkContext.broadcast(plists)
    b_trees = spark.sparkContext.broadcast(trees)
    b_tomb = spark.sparkContext.broadcast(index.tombstones)
    stats = index.stats
    n_slices = max(
        1, slices_per_core * spark.sparkContext.defaultParallelism
    )

    def run(pid, qids):
        t0 = _time.perf_counter()
        n = 0
        for qid in qids:
            q, spec = b_trees.value[qid]
            tree = _tree_from_spec(spec)
            if tree is None:
                continue
            for t in tree_terms(tree):
                t.plist = b_plists.value[(t.field, t.text)]
            scorer = Scorer(stats, model=weighting, exclude=b_tomb.value)
            scorer.topk(tree, limit)
            n += 1
        sec = _time.perf_counter() - t0
        yield (pid, n, sec)

    rows = (
        spark.sparkContext
        .parallelize(list(trees), numSlices=n_slices)
        .mapPartitionsWithIndex(run)
        .collect()
    )
    return [
        {"partition_id": pid, "n_queries": n, "kernel_sec": round(sec, 4),
         "queries_per_sec": round(n / sec, 1) if sec > 0 else None}
        for pid, n, sec in rows
    ]


# -- picklable tree spec (dataclasses with numpy members don't ship well) --
def _tree_spec(node):
    if node is None:
        return None
    if isinstance(node, Term):
        return ("t", node.field, node.text, node.boost)
    if isinstance(node, Not):
        return ("n", _tree_spec(node.child))
    tag = "a" if isinstance(node, And) else "o"
    return (tag, [_tree_spec(c) for c in node.children])


def _tree_from_spec(spec):
    if spec is None:
        return None
    if spec[0] == "t":
        return Term(spec[1], spec[2], spec[3])
    if spec[0] == "n":
        return Not(_tree_from_spec(spec[1]))
    children = [_tree_from_spec(c) for c in spec[1]]
    return And(children) if spec[0] == "a" else Or(children)
