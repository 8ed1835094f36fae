"""Real-WordNet loader: parse WNdb ``index.noun`` / ``data.noun``.

The reference expands queries with live NLTK WordNet
(``indexing/searching/queryExpansion.py:81-174``).  This sandbox has
neither ``nltk`` nor its corpora, so the engine ships a pinned
inventory (``plans/expansion.py``) — but the *data format* WordNet
distributes is public and stable (the WNdb format documented in the
``wndb(5WN)`` man page), and this module makes dropping in the real
database a pure data task: point ``SEWIKI_WORDNET_DIR`` at any
unpacked WordNet 3.x ``dict/`` directory (the files ``index.noun`` and
``data.noun``) and the query-expansion pipeline runs on the genuine
synset graph — real sense inventory, real ``lemma_names()``, real
glosses, and a graph-derived Wu-Palmer similarity that mirrors NLTK's
``Synset.wup_similarity`` (lowest common hypernym by max depth,
shortest hypernym-path distances, simulated root for disconnected
pairs).

Nothing here imports nltk; the parser and the similarity are derived
from the published file-format spec and the published WUP formula
(Wu & Palmer, ACL 1994).  Tested against a hand-authored sample in the
exact WNdb byte format (``tests/test_wordnet_db.py``), so the first
run against a real ``dict/`` dir is a data swap, not a code change.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache


@dataclass
class WordNetInventory:
    """A noun-synset inventory with the exact surface the expansion
    pipeline consumes: token→ordered senses, sense→lemma names,
    sense→gloss, and pairwise Wu-Palmer similarity.

    ``hypernyms`` maps sense name → tuple of direct hypernym sense
    names (``@`` and ``@i`` pointers); WUP is computed on that DAG the
    way NLTK does: lowest common hypernym chosen by maximum depth,
    ``depth = lcs_max_depth + 1``, shortest ancestor-path distances,
    and a simulated root (depth 1) when two trees don't connect.
    """

    synsets: dict[str, tuple[str, ...]]
    sense_lemmas: dict[str, tuple[str, ...]]
    glosses: dict[str, str]
    hypernyms: dict[str, tuple[str, ...]] = field(default_factory=dict)

    def __post_init__(self):
        self._depth_memo: dict[str, int] = {}
        self._wup_memo: dict[tuple[str, str], float] = {}

    # -- graph helpers -------------------------------------------------
    def _max_depth(self, sense: str) -> int:
        """Longest hypernym path from ``sense`` to any root (root=0) —
        NLTK's ``Synset.max_depth()``.  Iterative (real WordNet's noun
        tree is ~20 deep, but don't trust recursion on foreign data)."""
        memo = self._depth_memo
        stack = [sense]
        while stack:
            s = stack[-1]
            if s in memo:
                stack.pop()
                continue
            parents = self.hypernyms.get(s, ())
            missing = [p for p in parents if p not in memo]
            if missing:
                stack.extend(missing)
                continue
            memo[s] = (1 + max(memo[p] for p in parents)) if parents else 0
            stack.pop()
        return memo[sense]

    def _ancestor_dists(self, sense: str) -> dict[str, int]:
        """sense → {ancestor (incl. self): shortest hypernym-path
        length} via BFS up the DAG."""
        dists = {sense: 0}
        frontier = [sense]
        while frontier:
            nxt = []
            for s in frontier:
                d = dists[s] + 1
                for p in self.hypernyms.get(s, ()):
                    if p not in dists or d < dists[p]:
                        dists[p] = d
                        nxt.append(p)
            frontier = nxt
        return dists

    def wup(self, a: str, b: str) -> float:
        """``Synset.wup_similarity`` re-derivation: 2·depth(lcs) /
        (d1 + d2 + 2·depth(lcs)) with depth(lcs) = max_depth(lcs) + 1,
        lcs the common hypernym maximizing max_depth, d1/d2 shortest
        paths to it; disconnected pairs go through a simulated root of
        depth 1 (NLTK ``simulate_root=True``, the noun default)."""
        if a == b:
            return 1.0
        key = (a, b) if a <= b else (b, a)
        hit = self._wup_memo.get(key)
        if hit is not None:
            return hit
        if a not in self.sense_lemmas or b not in self.sense_lemmas:
            val = 0.0
        else:
            da, db = self._ancestor_dists(a), self._ancestor_dists(b)
            common = set(da) & set(db)
            if common:
                lcs = max(common, key=self._max_depth)
                depth = self._max_depth(lcs) + 1
                val = 2.0 * depth / (da[lcs] + db[lcs] + 2.0 * depth)
            else:
                # simulated root one level above each tree's roots
                d1 = min(v for s, v in da.items()
                         if not self.hypernyms.get(s)) + 1
                d2 = min(v for s, v in db.items()
                         if not self.hypernyms.get(s)) + 1
                val = 2.0 / (d1 + d2 + 2.0)
        self._wup_memo[key] = val
        return val


def _data_lines(path: str):
    """Yield non-preamble lines: the WNdb copyright header lines all
    start with two spaces (``wndb(5WN)``)."""
    with open(path, encoding="utf-8", errors="strict") as f:
        for line in f:
            if line.startswith(" "):
                continue
            line = line.rstrip("\n")
            if line:
                yield line


def _parse_data_noun(path: str):
    """data.noun → {offset: (words, gloss, hypernym_offsets)}.

    Line format (wndb(5WN)): ``synset_offset lex_filenum ss_type
    w_cnt word lex_id [word lex_id...] p_cnt [ptr...] | gloss`` with
    ``w_cnt`` 2-digit hex, each pointer ``symbol offset pos st`` and
    hypernyms carrying symbol ``@`` (or ``@i`` for instances).
    """
    out: dict[str, tuple[tuple[str, ...], str, tuple[str, ...]]] = {}
    for line in _data_lines(path):
        head, _, gloss = line.partition("|")
        f = head.split()
        offset, ss_type = f[0], f[2]
        if ss_type != "n":
            continue
        w_cnt = int(f[3], 16)
        words = tuple(f[4 + 2 * i] for i in range(w_cnt))
        p = 4 + 2 * w_cnt
        p_cnt = int(f[p])
        hyper = []
        for i in range(p_cnt):
            sym, tgt_off, tgt_pos, _st = f[p + 1 + 4 * i: p + 5 + 4 * i]
            if sym in ("@", "@i") and tgt_pos == "n":
                hyper.append(tgt_off)
        out[offset] = (words, gloss.strip(), tuple(hyper))
    return out


def _parse_index_noun(path: str):
    """index.noun → {lemma: [synset_offsets in sense order]} — the
    offsets list is ordered most-frequent-sense first, which is what
    makes ``synsets(token)[0]`` the WSD fallback sense.

    Line format: ``lemma pos synset_cnt p_cnt [ptr_symbol...]
    sense_cnt tagsense_cnt synset_offset [synset_offset...]``.
    """
    out: dict[str, list[str]] = {}
    for line in _data_lines(path):
        f = line.split()
        lemma, pos = f[0], f[1]
        if pos != "n":
            continue
        synset_cnt, p_cnt = int(f[2]), int(f[3])
        offsets = f[4 + p_cnt + 2:]
        if len(offsets) != synset_cnt:  # malformed line — fail fast
            raise ValueError(f"index.noun: bad line for {lemma!r}")
        out[lemma] = offsets
    return out


def load_wordnet_dir(dict_dir: str) -> WordNetInventory:
    """Parse ``<dict_dir>/index.noun`` + ``data.noun`` into a
    :class:`WordNetInventory`.

    Sense names follow NLTK's convention: ``<first_word>.n.<NN>``
    where ``first_word`` is the synset's first lemma lowercased and
    ``NN`` is 1 + that word's sense position in ``index.noun`` — so
    the inventory's names line up with the reference's
    (``"dog.n.01"``-style) and with every fixture in this repo.
    """
    data = _parse_data_noun(os.path.join(dict_dir, "data.noun"))
    index = _parse_index_noun(os.path.join(dict_dir, "index.noun"))

    names: dict[str, str] = {}
    for offset, (words, _gloss, _hyper) in data.items():
        head = words[0].lower()
        senses = index.get(head, [])
        try:
            n = senses.index(offset) + 1
        except ValueError:
            n = 1  # data row absent from index — name it sense 01
        names[offset] = f"{head}.n.{n:02d}"

    synsets = {
        lemma: tuple(names[o] for o in offsets if o in names)
        for lemma, offsets in index.items()
    }
    sense_lemmas = {
        names[o]: words for o, (words, _g, _h) in data.items()
    }
    glosses = {names[o]: g for o, (_w, g, _h) in data.items() if g}
    hypernyms = {
        names[o]: tuple(names[h] for h in hyper if h in names)
        for o, (_w, _g, hyper) in data.items() if hyper
    }
    return WordNetInventory(synsets, sense_lemmas, glosses, hypernyms)


@lru_cache(maxsize=1)
def from_env() -> WordNetInventory | None:
    """Load the inventory named by ``SEWIKI_WORDNET_DIR`` (explicit
    opt-in — an engine run never silently changes semantics because a
    dict dir happens to exist somewhere).  Raises on a bad dir: a
    configured-but-broken path must fail fast, not fall back."""
    d = os.environ.get("SEWIKI_WORDNET_DIR")
    if not d:
        return None
    return load_wordnet_dir(d)
