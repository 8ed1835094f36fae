"""Deterministic synthetic corpus of Common-Crawl-style web pages.

Generates the ``pages`` input table (FIXTURES.md §1): ``(url, warc_ts,
html, text, lang)``.  ``text`` is wikitext-flavored so every branch of
the reference cleaner (``filterText.py:143-174``) and link extractor
(``filterText.py:49-118``) is exercised, and the 30 reference query
topics (``evaluation.py:22-30``) are injected at controlled term
frequencies so every query has a non-trivial, known-by-oracle ranking.

Each page is a pure function of ``(doc_index, n_docs)`` — generation is
embarrassingly parallel and identical whether produced on the driver
(pandas) or distributively (``spark.range(n).mapInPandas``), which is
how a 10^12-row corpus would be synthesized on a real cluster.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

# The 30 reference queries, verbatim from
# /root/reference/indexing/evaluation.py:22-30.
QUERIES = [
    "DNA", "Apple", "Epigenetics", "Hollywood", "Maya",
    "Microsoft", "Precision", "Tuscany", "99 balloons",
    "Computer Programming", "Financial meltdown",
    "Justin Timberlake", "Least Squares", "Mars robots",
    "Page six", "Roman Empire", "Solar energy", "Statistical Significance",
    "Steve Jobs", "The Maya", "Triple Cross", "US Constitution",
    "Eye of Horus", "Madam I’m Adam", "Mean Average Precision",
    "Physics Nobel Prizes", "Read the manual", "Spanish Civil War",
    "Do geese see god", "Much ado about nothing",
]

# Zipf-ish filler vocabulary (deterministic, no stopword collisions with
# topic terms).  Includes a couple of Whoosh stopwords on purpose.
_FILLER = (
    "history culture science nature people world region century modern "
    "ancient development system theory method result study research city "
    "population government language music art film industry economy war "
    "peace north south east west river mountain island forest the of and "
    "in to museum festival tradition architecture literature philosophy "
    "mathematics physics chemistry biology geography climate species "
    "kingdom republic dynasty revolution treaty alliance trade harbor"
).split()

_CRUFT = [
    "{{Infobox place|url=http://www.example.com/ref}} ",
    "{{lang-la|Imperium Romanum}} ",
    "{{reflist|30em}} ",
    "{{commons category|Topic}} ",
    "{{coord|41|54|N|12|30|E}} ",
    "[http://www.archive.example/item external archive] ",
    "see http://plain.example/url for details ",
    "visit portal.example.com or docs.example.org today ",
    "<gallery>\nFile:a.png\nFile:b.png\n</gallery> ",
    "[[File:map_of_region.png|thumb|A map]] ",
    "[[Media:anthem.ogg]] ",
    "<ref name=a>citation</ref> ",
    "<div class=\"infobox\">boxed</div> ",
    "[[Category:Synthetic pages]] ",
    "[[wikt:lexeme]] [[Talk:Something]] ",
    "header = value | cell * item ",
]

BASE_URL = "https://en.example.org/wiki/"


def title_for(i: int) -> str:
    topic = QUERIES[i % len(QUERIES)]
    slug = "".join(c for c in topic if c.isalnum() or c == " ").replace(" ", "")
    return f"{slug} {i:07d}"


def url_for(i: int) -> str:
    return BASE_URL + title_for(i).replace(" ", "_")


def _links_for(i: int, n_docs: int, rng: random.Random) -> list[str]:
    """Deterministic link targets with a skewed in-degree distribution:
    low doc indices act as hubs (power-law-ish), as on the real web."""
    out = []
    n_links = 2 + (i % 5)
    for k in range(n_links):
        # preferential attachment flavour: mostly small targets
        r = rng.random()
        if r < 0.5:
            j = rng.randrange(0, max(1, n_docs // 20))
        else:
            j = rng.randrange(0, n_docs)
        if j != i:
            out.append(title_for(j))
    return out


def make_page(i: int, n_docs: int) -> dict:
    """Pure deterministic page generator."""
    rng = random.Random(f"page-{i}-{n_docs}")
    title = title_for(i)
    url = url_for(i)
    lang = "de" if i % 29 == 7 else "en"
    warc_ts = dt.datetime(2024, 1, 1) + dt.timedelta(
        seconds=(i * 37) % (365 * 24 * 3600)
    )

    if i % 41 == 13:
        text = f"#REDIRECT [[{title_for((i + 1) % n_docs)}]]"
        return {
            "url": url, "warc_ts": warc_ts,
            "html": f"<html><title>{title}</title></html>".encode(),
            "text": text, "lang": lang,
        }

    topic = QUERIES[i % len(QUERIES)]
    # controlled topic tf: varies across docs of the same topic so the
    # BM25 ranking within a topic is non-trivial
    topic_reps = 1 + (i // len(QUERIES)) % 7
    # secondary topic adds cross-topic matches
    topic2 = QUERIES[(i * 7 + 3) % len(QUERIES)]
    topic2_reps = (i // 11) % 3

    parts: list[str] = []
    parts.append(f"'''{title}''' is a synthetic page about {topic}. ")
    for _ in range(topic_reps):
        parts.append(f"The subject of {topic} appears throughout history. ")
    for _ in range(topic2_reps):
        parts.append(f"It also touches on {topic2}. ")
    # filler paragraphs — length varies so BM25 length-normalization matters
    n_filler = 10 + (i * 13) % 120
    parts.append(" ".join(rng.choice(_FILLER) for _ in range(n_filler)) + " ")
    # wikitext cruft exercising cleaner branches
    for frag in rng.sample(_CRUFT, k=3 + (i % 4)):
        parts.append(frag)
    # internal links
    for target in _links_for(i, n_docs, rng):
        parts.append(f"[[{target}|{target.split()[0]}]] ")
    # occasional self/section/subpage/interwiki flavours
    if i % 17 == 2:
        parts.append(f"[[{title}]] [[#History]] [[/archive]] [[../sister]] ")
    text = "".join(parts)

    return {
        "url": url, "warc_ts": warc_ts,
        "html": f"<html><title>{title}</title><body>{len(text)}</body></html>".encode(),
        "text": text, "lang": lang,
    }


def generate_pages_pdf(n_docs: int, start: int = 0, end: int | None = None) -> pd.DataFrame:
    """Driver-side generation of pages [start, end) of an n_docs corpus."""
    end = n_docs if end is None else end
    return pd.DataFrame([make_page(i, n_docs) for i in range(start, end)])


def generate_pages_df(spark, n_docs: int, n_partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas(make_page).

    Identical content to ``generate_pages_pdf`` for the same n_docs —
    the per-page RNG is seeded by (i, n_docs) alone.
    """
    from . import schemas

    n_partitions = n_partitions or max(8, n_docs // 25_000)

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), n_docs) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            yield out

    return (
        spark.range(0, n_docs, 1, n_partitions)
        .mapInPandas(gen, schema=schemas.PAGES)
    )
