"""Pure-Python oracle engine: reference semantics, no Spark, no numpy.

Implements, in plain dicts/floats, exactly what the reference computes
(and therefore what the distributed engine must reproduce rank- and
score-identically):

* the build: lang/redirect/duplicate filters, title derivation, clean
  (T1) + links (T2), dense doc ids by url order, per-field analysis
  (A2/A3), tf/df/fl/avgfl accounting,
* query parse (multifield AND/OR with boosts, expansion with the pinned
  fixture at 0.5 boost),
* Whoosh-semantics scoring: BM25F (k1=1.2, b=0.75,
  idf=ln(N/(df+1))+1), TF_IDF (w·idf), Frequency (w); score = sum of
  matching leaves under satisfied And ancestors; ties by ascending doc,
* SNAP/Berkhin PageRank (C=0.85, eps=1e-4, max 100 iters) and the
  reference blend: final = score · round(1 + (pr/max_rel)^4, 5),
  stable re-sort.

The text kernels (cleaner, analyzers, stemmer) are shared with the
engine — they are independently golden-tested against the actual
reference code in test_reference_parity.py.  Everything engine-side
(codec, segments, merge, WAND, Spark plans) is re-verified against
this oracle.
"""

from __future__ import annotations

import math
from collections import defaultdict

from search_engine_wikipedia_spark.functions.textproc import (
    analyze_text,
    analyze_title,
    clean_wikitext,
    extract_links,
)
from search_engine_wikipedia_spark.plans.expansion import Expander

K1, B = 1.2, 0.75


class OracleIndex:
    def __init__(self, pages: list[dict], lang: str = "en"):
        # --- filters (S2/S3 analogues) + title derivation ---
        seen = set()
        rows = []
        for p in pages:
            if p["lang"] != lang:
                continue
            if (p["text"] or "").startswith("#REDIRECT"):
                continue
            if p["url"] in seen:
                continue
            seen.add(p["url"])
            title = p["url"].split("/")[-1].replace("_", " ")
            rows.append((p["url"], title, p["text"]))
        rows.sort(key=lambda r: r[0])  # dense id = rank of url

        self.docs = {}          # doc_id -> (url, title, clean_text, links)
        self.postings = defaultdict(dict)  # (field, term) -> {doc: tf}
        self.fl = {"text": {}, "title": {}}
        for doc_id, (url, title, text) in enumerate(rows):
            clean = clean_wikitext(text)
            links = extract_links(text, title)["links"]
            self.docs[doc_id] = (url, title, clean, links)
            for field, toks in (
                ("text", analyze_text(clean)),
                ("title", analyze_title(title)),
            ):
                self.fl[field][doc_id] = len(toks)
                counts = defaultdict(int)
                for t in toks:
                    counts[t] += 1
                for t, c in counts.items():
                    self.postings[(field, t)][doc_id] = c

        self.n_docs = len(self.docs)
        self.avg_len = {
            f: (sum(self.fl[f].values()) / self.n_docs if self.n_docs else 1.0)
            or 1.0
            for f in ("text", "title")
        }
        self._pagerank = None

    # ------------------------------------------------------------------
    # scoring
    # ------------------------------------------------------------------
    def idf(self, field, term):
        df = len(self.postings.get((field, term), {}))
        return math.log(self.n_docs / (df + 1)) + 1.0

    def leaf_score(self, field, term, doc, boost, model):
        tf = self.postings.get((field, term), {}).get(doc)
        if tf is None:
            return None
        w = tf * boost
        if model == "BM25F":
            fl = self.fl[field][doc]
            return self.idf(field, term) * (w * (K1 + 1.0)) / (
                w + K1 * ((1.0 - B) + B * fl / self.avg_len[field])
            )
        if model == "TF_IDF":
            return w * self.idf(field, term)
        return w

    def eval_node(self, node, doc, model):
        """→ (matches: bool, score: float); node = ('t',f,term,boost) |
        ('a',[...]) | ('o',[...]) | ('n',child) — same spec as the
        engine's trees (plans.query._tree_spec)."""
        if node[0] == "t":
            s = self.leaf_score(node[1], node[2], doc, node[3], model)
            return (s is not None), (s or 0.0)
        if node[0] == "n":
            m, _ = self.eval_node(node[1], doc, model)
            return (not m), 0.0
        if node[0] == "a":
            total = 0.0
            for c in node[1]:
                m, s = self.eval_node(c, doc, model)
                if not m:
                    return False, 0.0
                total += s
            return True, total
        matched = False
        total = 0.0
        for c in node[1]:
            m, s = self.eval_node(c, doc, model)
            if m:
                matched = True
                total += s
        return matched, (total if matched else 0.0)

    def node_candidates(self, node):
        if node[0] == "t":
            return set(self.postings.get((node[1], node[2]), {}))
        if node[0] == "n":
            # candidates come from positive siblings only (mirrors the
            # engine: a negation cannot seed; eval_node still filters)
            return set()
        sets = [self.node_candidates(c) for c in node[1]
                if c[0] != "n"]
        if not sets:
            return set()
        if node[0] == "a":
            out = sets[0]
            for s in sets[1:]:
                out = out & s
            return out
        out = set()
        for s in sets:
            out |= s
        return out

    # ------------------------------------------------------------------
    # parse (mirrors plans.query.parse_query but on plain tuples)
    # ------------------------------------------------------------------
    def parse(self, text, group="AND", text_boost=1.0, title_boost=1.0,
              expand=False):
        def token_node(w, tb, tib):
            terms = []
            tt = analyze_text(w)
            ti = analyze_title(w)
            if tt:
                terms.append(("t", "text", tt[0], tb))
            if ti:
                terms.append(("t", "title", ti[0], tib))
            return ("o", terms) if terms else None

        nodes = [token_node(w, text_boost, title_boost) for w in text.split()]
        nodes = [n for n in nodes if n is not None]
        orig = None
        if len(nodes) == 1:
            orig = nodes[0]
        elif nodes:
            orig = ("a", nodes) if group == "AND" else ("o", nodes)

        if expand:
            syns = Expander().expansion(text)
            syn_nodes = [
                token_node(w, text_boost * 0.5, title_boost * 0.5)
                for w in syns
            ]
            syn_nodes = [n for n in syn_nodes if n is not None]
            if syn_nodes:
                syn = ("o", syn_nodes) if len(syn_nodes) > 1 else syn_nodes[0]
                orig = ("o", [orig, syn]) if orig is not None else syn
        return orig

    # ------------------------------------------------------------------
    # search (exhaustive), pagerank, blend
    # ------------------------------------------------------------------
    def search(self, text, limit=10, exp=False, page_rank=False,
               text_boost=1.0, title_boost=1.0, weighting="BM25F",
               group="AND"):
        tree = self.parse(text, group, text_boost, title_boost, exp)
        if tree is None:
            return []
        scored = []
        for doc in sorted(self.node_candidates(tree)):
            m, s = self.eval_node(tree, doc, weighting)
            if m:
                scored.append((doc, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        top = scored[:limit]
        if not page_rank or not top:
            return top
        pr = self.pagerank()
        prs = {d: pr[d] for d, _ in top if d in pr}
        if prs:
            max_rel = max(prs.values())
            mult = {
                d: round(1.0 + (p / max_rel) ** 4, 5) for d, p in prs.items()
            }
        else:
            mult = {}
        blended = [(d, s * mult.get(d, 1.0), s) for d, s in top]
        blended.sort(key=lambda x: -x[1])  # python sort: stable for ties
        return [(d, f) for d, f, _ in blended]

    def edges(self):
        by_title = {v[1]: k for k, v in self.docs.items()}
        es = set()
        for doc_id, (_, _, _, links) in self.docs.items():
            for l in set(links):
                if l in by_title:
                    es.add((doc_id, by_title[l]))
        return es

    def pagerank(self, damping=0.85, eps=1e-4, max_iter=100):
        if self._pagerank is not None:
            return self._pagerank
        nodes = list(self.docs)
        n = len(nodes)
        es = self.edges()
        outdeg = defaultdict(int)
        inlinks = defaultdict(list)
        for s, d in es:
            outdeg[s] += 1
        for s, d in es:
            inlinks[d].append(s)
        pr = {v: 1.0 / n for v in nodes}
        for _ in range(max_iter):
            tmp = {}
            for v in nodes:
                acc = 0.0
                for u in inlinks[v]:
                    acc += pr[u] / outdeg[u]
                tmp[v] = damping * acc
            total = sum(tmp.values())
            leaked = (1.0 - total) / n
            diff = 0.0
            new = {}
            for v in nodes:
                nv = tmp[v] + leaked
                diff += abs(nv - pr[v])
                new[v] = nv
            pr = new
            if diff < eps:
                break
        self._pagerank = pr
        return pr
