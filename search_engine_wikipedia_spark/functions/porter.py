"""Porter stemmer, matching the variant bundled with Whoosh 2.7.4.

The reference engine stems the ``text`` field with Whoosh's
``StemmingAnalyzer`` (reference ``indexing/analysis/analyzers.py:27-33``,
used in the schema at ``indexing/index.py:38``), whose stem function is
``whoosh.lang.porter.stem`` — a regex-based port of Martin Porter's
original algorithm (http://tartarus.org/~martin/PorterStemmer/).  Whoosh
is not installable in this environment, so this is a from-scratch
implementation of that published algorithm; it is golden-tested in
``tests/test_textproc.py`` against the sample vocabulary from the
published algorithm description.

Pure Python on purpose: the same kernel is used by the distributed
engine (inside Arrow-batched pandas UDFs, with an unbounded per-worker
memo mirroring the reference's ``cachesize=-1``) and by the test oracle,
so index-time and query-time analysis are guaranteed to agree.
"""

from __future__ import annotations

import re
from functools import lru_cache

_step2list = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}

_step3list = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic",
    "ical": "ic", "ful": "", "ness": "",
}

_cons = "[^aeiou]"
_vowel = "[aeiouy]"
_cons_seq = "[^aeiouy]*"
_vowel_seq = "[aeiou]*"

# m > 0
_mgr0 = re.compile("^(" + _cons_seq + ")?" + _vowel + _vowel_seq + _cons + _cons_seq)
# m == 1  (used with a trailing optional vowel sequence: m == 1 exactly)
_meq1 = re.compile(
    "^(" + _cons_seq + ")?" + _vowel + _vowel_seq + _cons + _cons_seq
    + "(" + _vowel_seq + ")?$"
)
# m > 1
_mgr1 = re.compile(
    "^(" + _cons_seq + ")?" + _vowel + _vowel_seq + _cons + _cons_seq
    + _vowel + _vowel_seq + _cons + _cons_seq
)
# vowel in stem
_s_v = re.compile("^(" + _cons_seq + ")?" + _vowel)
# cvc ending, second c not w, x or y
_c_v = re.compile("^" + _cons_seq + _vowel + "[^aeiouwxy]$")

_ed_ing = re.compile("^(.*)(ed|ing)$")
_at_bl_iz = re.compile("(at|bl|iz)$")
_double_cons = re.compile("([^aeiouylsz])\\1$")
_step2 = re.compile(
    "^(.+?)(ational|tional|enci|anci|izer|bli|alli|entli|eli|ousli|ization"
    "|ation|ator|alism|iveness|fulness|ousness|aliti|iviti|biliti|logi)$"
)
_step3 = re.compile("^(.+?)(icate|ative|alize|iciti|ical|ful|ness)$")
_step4_1 = re.compile(
    "^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate"
    "|iti|ous|ive|ize)$"
)
_step4_2 = re.compile("^(.+?)(s|t)(ion)$")
_step5 = re.compile("^(.+?)e$")


def _stem(w: str) -> str:
    if len(w) < 3:
        return w

    first_is_y = w[0] == "y"
    if first_is_y:
        w = "Y" + w[1:]

    # Step 1a
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif w[-2:-1] != "s":
            w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        stem = w[:-3]
        if _mgr0.match(stem):
            w = w[:-1]
    else:
        m = _ed_ing.match(w)
        if m:
            stem = m.group(1)
            if _s_v.match(stem):
                w = stem
                if _at_bl_iz.search(w):
                    w += "e"
                elif _double_cons.search(w):
                    w = w[:-1]
                elif _c_v.match(w):
                    w += "e"

    # Step 1c
    if w.endswith("y"):
        stem = w[:-1]
        if _s_v.match(stem):
            w = stem + "i"

    # Step 2
    m = _step2.match(w)
    if m:
        stem, suffix = m.group(1), m.group(2)
        if _mgr0.match(stem):
            w = stem + _step2list[suffix]

    # Step 3
    m = _step3.match(w)
    if m:
        stem, suffix = m.group(1), m.group(2)
        if _mgr0.match(stem):
            w = stem + _step3list[suffix]

    # Step 4
    m = _step4_1.match(w)
    if m:
        stem = m.group(1)
        if _mgr1.match(stem):
            w = stem
    else:
        m = _step4_2.match(w)
        if m:
            stem = m.group(1) + m.group(2)
            if _mgr1.match(stem):
                w = stem

    # Step 5
    m = _step5.match(w)
    if m:
        stem = m.group(1)
        if _mgr1.match(stem) or (_meq1.match(stem) and not _c_v.match(stem)):
            w = stem

    if w.endswith("ll") and _mgr1.match(w):
        w = w[:-1]

    if first_is_y:
        w = "y" + w[1:]

    return w


# The reference's StemmingAnalyzer_ uses cachesize=-1 — an unbounded stem
# cache (analyzers.py:33).  lru_cache(None) is the per-process analogue;
# on Spark it memoizes per executor worker.
stem = lru_cache(maxsize=None)(_stem)
