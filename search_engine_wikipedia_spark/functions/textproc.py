"""Text-processing kernels: wikitext cleaning, link extraction, analyzers.

Pure-Python/pandas kernels re-deriving the reference semantics:

* ``clean_wikitext``   — the 22 ordered ``re.DOTALL`` substitutions of
  ``FilterWikiText.getCleaned`` (reference
  ``indexing/xmlParsing/filterText.py:122-179``).  The per-document
  output is **byte-identical** to the reference cleaner (the
  ``input_hint`` invariant); tests assert this against golden pairs.
* ``extract_links``    — link + category resolution of
  ``FilterWikiText.getLinkAndCategory`` (``filterText.py:18-119``):
  ``[[target|display]]`` pattern, ``#section``/self-link drops,
  ``/sub`` and ``../rel`` resolution, ``Category:`` split, ``{{var}}``
  and ``Image:/Manual:/Extension:`` drops, interwiki-prefix and
  invalid-namespace drops, final ``:`` strip.
* ``analyze_text`` / ``analyze_title`` — Whoosh analyzer chains
  (reference ``indexing/analysis/analyzers.py:20-33``; selected in the
  schema at ``indexing/index.py:25-39``): regex tokenizer
  ``\\w+(\\.?\\w+)*`` → lowercase → stop-word / minsize filter →
  (text field only) Porter stem.

Each kernel has a vectorized pandas wrapper for use inside Arrow-batched
Spark UDFs — no per-row Python at the DataFrame level.
"""

from __future__ import annotations

import re
from os import path as _os_path
from typing import Iterable

import pandas as pd

from .porter import stem

# ---------------------------------------------------------------------------
# Namespace blocklist — reference indexing/xmlParsing/saxReader.py:22-55.
# Keys are MediaWiki namespace numbers; values are the canonical names.
# Used (a) by the XML-era namespace filter (S2) and (b) by the link
# extractor, which drops links whose prefix equals a name with '_'→' '
# (filterText.py:106-108).
# ---------------------------------------------------------------------------
NS_NOT_VALID = {
    "-2": "Media", "-1": "Special", "1": "Talk", "2": "User", "3": "User_talk",
    "4": "Wikipedia", "5": "Wikipedia_talk", "6": "File", "7": "File_talk",
    "8": "MediaWiki", "9": "MediaWiki_talk", "10": "Template",
    "11": "Template_talk", "12": "Help", "13": "Help_talk", "14": "Category",
    "15": "Category_talk", "100": "Portal", "101": "Portal_talk",
    "108": "Book", "109": "Book_talk", "118": "Draft", "119": "Draft_talk",
    "446": "Education_Program", "447": "Education_Program_talk",
    "710": "TimedText", "711": "TimedText_talk", "828": "Module",
    "829": "Module_talk", "2300": "Gadget", "2301": "Gadget_talk",
    "2302": "Gadget_definition", "2303": "Gadget_definition_talk",
    "2600": "Topic",
}

# Interwiki prefixes — the reference fetches the full MediaWiki
# interwiki map once and pickles it (interwikiLink.py:12-51).  The
# complete 772-prefix set is pinned as a checked-in fixture
# (functions/interwiki.py) so unknown-prefix links can't leak into the
# link graph and perturb PageRank on a real dump.
from .interwiki import INTERWIKI_PREFIXES  # noqa: F401  (re-export)

# ---------------------------------------------------------------------------
# T1 — wikitext cleaner.  The exact ordered replacement list of
# filterText.py:143-174, applied with re.DOTALL exactly as the loop at
# filterText.py:175-178 does.
# ---------------------------------------------------------------------------
_CLEAN_REPLACEMENTS = [
    (r"{{[^}{]*?url=.*?}}", ""),
    (r"{{[^}{]*?lang.*?}}", ""),
    (r"{{[^}{]*?reflist.*?}}", ""),
    (r"{{[^}{]*?commons.*?}}", ""),
    (r"{{[^}{]*?coord.*?}}", ""),
    (r"\[http.+?\]", ""),
    (r"\shttp.+?\s", ""),
    (r"\s[^\s]+\.com\s?", ""),
    (r"\s[^\s]+\.org\s?", ""),
    (r"\s[^\s]+\.it\s?", ""),
    (r"\s[^\s]+\.en\s?", ""),
    (r"<gallery.*?</gallery>", ""),
    (r"\[\[File:.*?\]\]", ""),
    (r"\[\[Media:.*?\]\]", ""),
    (r"<[^<]*?>", ""),
    (r"\[", ""),
    (r"\]", ""),
    (r"\{", ""),
    (r"\}", ""),
    (r"\/", ""),
    (r"\:", " "),
    (r"\|", " "),
    (r"\=", " "),
    (r"\*", ""),
]
_CLEAN_COMPILED = [(re.compile(p, flags=re.DOTALL), r) for p, r in _CLEAN_REPLACEMENTS]


def clean_wikitext(text: str) -> str:
    """Byte-identical port of ``FilterWikiText.getCleaned`` (T1)."""
    res = text
    for pattern, repl in _CLEAN_COMPILED:
        res = pattern.sub(repl, res)
    return res


def clean_wikitext_series(texts: pd.Series) -> pd.Series:
    """Vectorized T1 for pandas UDFs.

    Runs the exact compiled ``re.sub`` loop over the array — pandas
    ``str.replace`` idioms are avoided so the regex semantics (DOTALL,
    lazy quantifiers, replacement order) cannot drift.
    """
    return texts.map(lambda t: clean_wikitext(t) if t is not None else None)


# ---------------------------------------------------------------------------
# T2 — link + category extraction (filterText.py:18-119).
# ---------------------------------------------------------------------------
_LINK_PATTERN = re.compile(r"\[\[([^\]]+?)\]\]")
_HASH_TAIL = re.compile(r"#.*")
_TRAILING_SLASH = re.compile(r"/\s*?$")
_FATHER_PAGE = re.compile(r"/[^/]+?$")
_DOTDOT = re.compile(r"..")  # reference uses r'..' (any 2 chars) — kept verbatim
_NS_CANDIDATE = re.compile(r"^:?[^:]+?:")
_COLON = re.compile(r":")

_NS_NOT_VALID_SPACED = tuple(v.replace("_", " ") for v in NS_NOT_VALID.values())


def extract_links(
    text: str,
    title: str,
    interwiki_prefixes: Iterable[str] = INTERWIKI_PREFIXES,
) -> dict:
    """Re-derivation of ``FilterWikiText.getLinkAndCategory`` (T2).

    Returns ``{'links': [...], 'categories': [...]}`` with the exact
    resolution/filter rules of filterText.py:49-118, in order:
    take the part before ``|``; drop ``#...`` self-section links and
    links equal to the page title; strip ``#tail`` and trailing ``/``;
    resolve ``/sub`` → ``title/sub`` and ``../x`` via the parent page;
    classify ``Category...``; drop ``{{var}}`` and ``Image:/Manual:/
    Extension:`` prefixes; drop interwiki prefixes and invalid
    namespaces; finally remove all ``:`` from kept links.
    """
    links: list[str] = []
    categories: list[str] = []
    prefixes = (
        interwiki_prefixes
        if isinstance(interwiki_prefixes, (set, frozenset))
        else frozenset(interwiki_prefixes)
    )

    for match in _LINK_PATTERN.finditer(text):
        res = match.group(1).split("|")[0].strip()

        if res.startswith("#") or res == title:
            continue
        is_category = False

        res = _HASH_TAIL.sub("", res)
        res = _TRAILING_SLASH.sub("", res)

        if res.startswith("/"):
            res = title + res
        elif res.startswith("../"):
            father_page = _FATHER_PAGE.sub("", title)
            # NOTE: the reference does re.sub(r'..', '', res) — an
            # UNESCAPED '..' pattern that deletes every 2-char window,
            # i.e. '../test3' → '/tes' + 't3' handling by re.sub
            # semantics.  Kept verbatim for parity.
            res = father_page + _DOTDOT.sub("", res)
        elif res.startswith("Category"):
            is_category = True
        elif res.startswith("{{"):
            res = None
        elif res.startswith(("Image:", "Manual:", "Extension:")):
            res = None
        else:
            m = _NS_CANDIDATE.search(res)
            if m is not None:
                pref = _COLON.sub("", m[0])
                if pref in prefixes:
                    res = None
                else:
                    for ns_not_valid in _NS_NOT_VALID_SPACED:
                        if pref == ns_not_valid:
                            res = None

        if res is not None:
            if is_category:
                categories.append(res)
            else:
                res = _COLON.sub("", res)
                links.append(res)

    return {"links": links, "categories": categories}


def extract_links_series(texts: pd.Series, titles: pd.Series) -> pd.Series:
    """Vectorized T2 → Series of list[str] (links only, as the engine uses)."""
    return pd.Series(
        [
            extract_links(t, ti)["links"] if t is not None else []
            for t, ti in zip(texts, titles)
        ],
        index=texts.index,
    )


# ---------------------------------------------------------------------------
# Analyzers (A2/A3) — Whoosh chains re-derived from the published Whoosh
# 2.7.4 source (github.com/mchaput/whoosh): default tokenizer pattern
# \w+(\.?\w+)*, STOP_WORDS frozenset, StopFilter minsize=2.
# ---------------------------------------------------------------------------
TOKEN_PATTERN = re.compile(r"\w+(?:\.?\w+)*", re.UNICODE)

STOP_WORDS = frozenset((
    "a", "an", "and", "are", "as", "at", "be", "by", "can", "for", "from",
    "have", "if", "in", "is", "it", "may", "not", "of", "on", "or", "tbd",
    "that", "the", "this", "to", "us", "we", "when", "will", "with", "yet",
    "you", "your",
))

MIN_TOKEN_SIZE = 2  # StopFilter default minsize


def tokenize_simple(text: str) -> list[str]:
    """A1 ``SimpleAnalyzer_``: tokenize + lowercase (analyzers.py:13-17)."""
    return [m.group(0).lower() for m in TOKEN_PATTERN.finditer(text)]


def analyze_title(text: str) -> list[str]:
    """A2 ``StandardAnalyzer_`` — title field: tokenize, lowercase,
    stopword/minsize filter (analyzers.py:20-24; schema index.py:39)."""
    return [
        t
        for t in tokenize_simple(text)
        if len(t) >= MIN_TOKEN_SIZE and t not in STOP_WORDS
    ]


def analyze_text(text: str) -> list[str]:
    """A3 ``StemmingAnalyzer_`` — text field: A2 + Porter stem with an
    unbounded memo (analyzers.py:27-33; schema index.py:38)."""
    return [stem(t) for t in analyze_title(text)]


# ---------------------------------------------------------------------------
# A4 — AccentStemmingAnalyzer (reference analyzers.py:36-46):
# StemmingAnalyzer | CharsetFilter(accent_map) — the accent fold runs
# AFTER stemming.  whoosh.support.charset.accent_map folds Latin
# accented letters to their base form; Unicode NFKD decomposition with
# combining marks stripped reproduces that fold for the Latin range
# (the sandbox has no whoosh to diff the full Sphinx charset table).
# ---------------------------------------------------------------------------
import unicodedata as _ud


def fold_accents(token: str) -> str:
    """'café' → 'cafe' (CharsetFilter(accent_map) analogue)."""
    return "".join(
        c for c in _ud.normalize("NFKD", token)
        if not _ud.combining(c)
    )


def analyze_text_accent(text: str) -> list[str]:
    """A4: tokenize, lowercase, stop/minsize filter, Porter stem, fold
    accents — defined-but-unused in the reference schema (index.py:38
    selects A3); selectable here via ``IndexBuilder``'s analyzer map."""
    return [fold_accents(t) for t in analyze_text(text)]


# ---------------------------------------------------------------------------
# A5 — LemmatizingAnalyzer (reference analyzers.py:49-61 + the
# LemmatizerFilter of analysis/filters.py: nltk WordNetLemmatizer, i.e.
# morphy noun rules against the WordNet lexicon).  The irregular-noun
# exception list is real WordNet data: the vendored ``noun.exc``
# extract (``data/wordnet/dict``, genuine WordNet 3.0 exc(5WN) pairs —
# see tools/make_wordnet_extract.py) merged over the builtin table
# below.  The file is CHECKED IN, never environment-resolved: analyzer
# output is baked into every index at build time, so A5 must be a
# deterministic function of the repo version — an exception list that
# varied with $SEWIKI_WORDNET_DIR would make an index built in one
# environment analyze queries differently in another.  The morphy
# suffix substitutions below carry conservative guards standing in for
# the full-lexicon membership check.
# ---------------------------------------------------------------------------
_BUILTIN_NOUN_EXCEPTIONS = {
    "geese": "goose", "feet": "foot", "teeth": "tooth", "mice": "mouse",
    "men": "man", "women": "woman", "children": "child", "oxen": "ox",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "wolves": "wolf", "calves": "calf", "shelves": "shelf",
    "halves": "half", "selves": "self", "elves": "elf", "loaves": "loaf",
    "cacti": "cactus", "fungi": "fungus", "nuclei": "nucleus",
    "analyses": "analysis", "diagnoses": "diagnosis", "oases": "oasis",
    "theses": "thesis", "crises": "crisis", "phenomena": "phenomenon",
    "criteria": "criterion", "indices": "index", "matrices": "matrix",
    "vertices": "vertex", "axes": "axis",
}

_VENDORED_NOUN_EXC = _os_path.join(
    _os_path.dirname(_os_path.dirname(_os_path.abspath(__file__))),
    "data", "wordnet", "dict", "noun.exc",
)


def _load_noun_exceptions() -> dict[str, str]:
    """Builtin table merged with the vendored WNdb ``noun.exc`` (file
    wins on conflict — it is the real-WordNet value).  Lines indented
    with spaces are the embedded license preamble (WNdb convention)."""
    exc = dict(_BUILTIN_NOUN_EXCEPTIONS)
    try:
        with open(_VENDORED_NOUN_EXC, encoding="utf-8") as f:
            for line in f:
                if line.startswith(" ") or not line.strip():
                    continue
                parts = line.split()
                if len(parts) >= 2:
                    exc[parts[0]] = parts[1]
    except FileNotFoundError:
        # Extract absent (e.g. a --py-files zip built without data/):
        # builtin table only — but LOUDLY, because a driver with the
        # file and executors without it would analyze divergently.
        # Same policy as plans.expansion._default_inventory: missing →
        # fallback, present-but-unreadable → raise.
        import warnings

        warnings.warn(
            f"vendored WordNet noun.exc not found at {_VENDORED_NOUN_EXC}; "
            "A5 lemmatization falls back to the builtin exception table — "
            "ship the package data/ directory to keep analyzers identical "
            "across driver and executors",
            RuntimeWarning,
            stacklevel=2,
        )
    return exc


NOUN_EXCEPTIONS = _load_noun_exceptions()

_ES_STEMS = ("ch", "sh", "ss", "x", "z")


def lemmatize_noun(word: str) -> str:
    """morphy-style noun lemmatization (WordNetLemmatizer stand-in)."""
    if word in NOUN_EXCEPTIONS:
        return NOUN_EXCEPTIONS[word]
    if word.endswith("ies") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("es") and len(word) > 3:
        stem_part = word[:-2]
        if stem_part.endswith(_ES_STEMS):
            return stem_part
    if (word.endswith("s") and len(word) > 3
            and not word.endswith(("ss", "us", "is"))):
        return word[:-1]
    return word


def analyze_text_lemma(text: str) -> list[str]:
    """A5: tokenize, lowercase, stop/minsize filter, lemmatize."""
    return [lemmatize_noun(t) for t in analyze_title(text)]


def analyze_series(texts: pd.Series, field: str) -> pd.Series:
    """Vectorized analyzer dispatch for pandas UDFs."""
    fn = ANALYZERS.get(field, analyze_title)
    return pd.Series(
        [fn(t) if t is not None else [] for t in texts], index=texts.index
    )


ANALYZERS = {
    "text": analyze_text,            # A3 (schema default, index.py:38)
    "title": analyze_title,          # A2 (schema default, index.py:39)
    "simple": tokenize_simple,       # A1
    "text_accent": analyze_text_accent,   # A4
    "text_lemma": analyze_text_lemma,     # A5
}
