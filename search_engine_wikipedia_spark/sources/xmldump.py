"""Wikipedia-XML dump source (reference S1-S5).

The reference streams one SAX event pipeline over the whole dump
(``indexing/xmlParsing/saxReader.py:270-333``) with per-page guards:

* S2 namespace filter — drop pages whose ``<ns>`` is in the 36-entry
  blocklist (``saxReader.py:22-55``, ``:126-136``),
* S3 redirect filter — drop pages whose text starts ``#REDIRECT``
  (``saxReader.py:148-158``),
* S4 revision-id guard — keep only the page ``<id>`` that precedes
  ``<revision>`` (``saxReader.py:93-94``, ``:139-145``),
* S5 subsetter — select pages by title set + first N noise pages
  (``saxReader.py:191-267``, driver ``filterDump.py``).

Spark-first shape: a dump is pre-split into per-``<page>`` (or
multi-page) XML fragments — one string per row — so parsing is
embarrassingly parallel; each partition runs the same SAX handler
inside an Arrow-batched ``mapInPandas`` kernel (incremental, constant
memory, exactly the reference's event pipeline per fragment).  At
100 TB the fragments come from a splittable ingest (e.g. the dump's
multistream index); here ``split_dump_text`` provides the fixture
path.
"""

from __future__ import annotations

import re
import xml.sax
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.textproc import NS_NOT_VALID

PAGE_SCHEMA = "title string, id_page string, ns string, text string"


class _PageHandler(xml.sax.ContentHandler):
    """Per-fragment SAX handler — field accumulation and guards mirror
    ``WikiDumpHandler`` (saxReader.py:74-158)."""

    def __init__(self, collect):
        super().__init__()
        self.collect = collect
        self._reset()

    def _reset(self):
        self.current_tag = ""
        self.title = ""
        self.id_page = ""
        self.ns = ""
        self.text = ""
        self.valid_block = True
        self.valid_id_page = True

    def startElement(self, tag, attrs):
        self.current_tag = tag
        if tag == "page":
            self._reset()
            self.current_tag = tag
        elif tag == "revision":
            self.valid_id_page = False  # S4: ids after <revision> ignored

    def characters(self, content):
        if not self.valid_block:
            return
        if self.current_tag == "title":
            self.title += content.strip()
        elif self.current_tag == "ns":
            self.ns += content.strip()
            if self.ns in NS_NOT_VALID:          # S2
                self.valid_block = False
        elif self.current_tag == "id":
            if self.valid_id_page:               # S4
                self.id_page += content
        elif self.current_tag == "text":
            # S3 is evaluated on the ACCUMULATED text at </text> (see
            # endElement): expat may split a text node at buffer
            # boundaries or entity references, so a per-chunk
            # startswith() both misses a '#REDIRECT' split across the
            # first two chunks and false-drops a page whose later chunk
            # happens to start with it.
            self.text += content

    def endElement(self, tag):
        self.current_tag = ""
        if tag == "text" and self.text.startswith("#REDIRECT"):  # S3
            self.valid_block = False
        if tag == "page" and self.valid_block and self.id_page:
            self.collect({
                "title": self.title,
                "id_page": self.id_page.strip(),
                "ns": self.ns or "0",
                "text": self.text,
            })


def parse_fragment(xml_text: str) -> list[dict]:
    """Parse one XML fragment (one or more ``<page>`` elements)."""
    rows: list[dict] = []
    handler = _PageHandler(rows.append)
    parser = xml.sax.make_parser()
    parser.setContentHandler(handler)
    # fragments need a synthetic root to be well-formed
    from io import StringIO

    parser.parse(StringIO(f"<pages>{xml_text}</pages>"))
    return rows


_PAGE_SPLIT = re.compile(r"(?=<page[\s>])")


def split_dump_text(dump_text: str, pages_per_fragment: int = 50) -> list[str]:
    """Split raw dump text into parseable multi-page fragments (the
    fixture-scale stand-in for multistream-index splitting)."""
    parts = [p for p in _PAGE_SPLIT.split(dump_text) if "<page" in p]
    # strip anything after the last </page> in each chunk
    out = []
    for i in range(0, len(parts), pages_per_fragment):
        chunk = "".join(parts[i:i + pages_per_fragment])
        end = chunk.rfind("</page>")
        if end != -1:
            out.append(chunk[: end + len("</page>")])
    return out


def read_dump(spark: SparkSession, fragments: list[str] | DataFrame,
              n_partitions: int | None = None) -> DataFrame:
    """fragments (xml strings) → pages DataFrame via distributed SAX.

    One SAX pipeline per fragment inside ``mapInPandas`` — the
    reference event pipeline, parallelized by fragment.
    """
    if isinstance(fragments, list):
        df = spark.createDataFrame(
            [(f,) for f in fragments], "fragment string"
        )
        if n_partitions:
            df = df.repartition(n_partitions)
    else:
        df = fragments

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for frag in pdf["fragment"]:
                rows.extend(parse_fragment(frag))
            if rows:
                yield pd.DataFrame(rows)[
                    ["title", "id_page", "ns", "text"]]

    return df.mapInPandas(run, schema=PAGE_SCHEMA)


def subset_pages(pages: DataFrame, titles_to_select: list[str],
                 total_docs_noise: int = 450) -> DataFrame:
    """S5 corpus subsetter (``filterDump.py:14-122``): selected titles
    plus the first N other pages (in dump = page-id order) as noise.

    The noise pick is ordered before ``limit``: an unordered Spark
    limit is nondeterministic across runs/partitionings, whereas the
    reference subsetter takes the first N pages in dump order — sorting
    on the numeric page id reproduces that deterministically.
    """
    from pyspark.sql import functions as F

    selected = pages.where(F.col("title").isin(titles_to_select))
    noise = (
        pages.where(~F.col("title").isin(titles_to_select))
        .orderBy(F.col("id_page").cast("long").asc_nulls_last(), "title")
        .limit(total_docs_noise)
    )
    return selected.unionByName(noise)
