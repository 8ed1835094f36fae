"""S1-S5 XML dump source: SAX guards vs the reference semantics."""

import pytest

from search_engine_wikipedia_spark.sources import xmldump


def page(title, pid, text, ns="0", rev_id=None):
    rev = f"<revision><id>{rev_id or int(pid)+1000}</id>" \
          f"<text>{text}</text></revision>"
    return (f"<page><title>{title}</title><ns>{ns}</ns>"
            f"<id>{pid}</id>{rev}</page>")


DUMP = "".join([
    page("Alpha", "1", "Alpha body [[Beta]]"),
    page("Talk:Alpha", "2", "talk page", ns="1"),          # S2: blocked ns
    page("Redir", "3", "#REDIRECT [[Alpha]]"),             # S3: redirect
    page("Beta", "4", "Beta body"),
    page("File:Pic", "5", "file page", ns="6"),            # S2
    page("Gamma", "6", "Gamma body"),
])


def test_parse_fragment_guards():
    rows = xmldump.parse_fragment(DUMP)
    assert [(r["title"], r["id_page"]) for r in rows] == [
        ("Alpha", "1"), ("Beta", "4"), ("Gamma", "6")]
    # S4: revision ids (1000+) never leak into id_page
    assert all(int(r["id_page"]) < 1000 for r in rows)


def test_split_and_distributed_read(spark):
    frags = xmldump.split_dump_text(DUMP, pages_per_fragment=2)
    assert len(frags) == 3 and all(f.endswith("</page>") for f in frags)
    df = xmldump.read_dump(spark, frags, n_partitions=2)
    rows = sorted((r["title"], r["id_page"], r["text"])
                  for r in df.collect())
    assert [t for t, _, _ in rows] == ["Alpha", "Beta", "Gamma"]
    assert rows[0][2] == "Alpha body [[Beta]]"


def test_subset_pages(spark):
    frags = xmldump.split_dump_text(DUMP, pages_per_fragment=10)
    pages_df = xmldump.read_dump(spark, frags)
    out = xmldump.subset_pages(pages_df, ["Gamma"], total_docs_noise=1)
    titles = {r["title"] for r in out.collect()}
    assert "Gamma" in titles and len(titles) == 2


def test_redirect_guard_survives_chunked_text():
    """S3 must evaluate on the ACCUMULATED text: expat splits text
    nodes at entity references, so '&#35;REDIRECT ...' arrives as a '#'
    chunk followed by 'REDIRECT ...' — a per-chunk startswith() would
    leak it through.  Conversely, an inner chunk that merely contains
    the marker must not drop a valid page."""
    redirect_split = (
        "<page><title>R</title><ns>0</ns><id>7</id>"
        "<revision><id>700</id>"
        "<text>&#35;REDIRECT [[Target]]</text></revision></page>"
    )
    assert xmldump.parse_fragment(redirect_split) == []

    valid_with_marker = (
        "<page><title>V</title><ns>0</ns><id>8</id>"
        "<revision><id>800</id>"
        "<text>safe prefix &#35;REDIRECT mentioned inside</text>"
        "</revision></page>"
    )
    rows = xmldump.parse_fragment(valid_with_marker)
    assert len(rows) == 1
    assert rows[0]["text"] == "safe prefix #REDIRECT mentioned inside"


def test_subset_pages_deterministic_noise(spark):
    """Noise pages are the FIRST-N in page-id order (dump order), not
    an arbitrary unordered limit."""
    frags = xmldump.split_dump_text(DUMP, pages_per_fragment=1)
    pages_df = xmldump.read_dump(spark, frags, n_partitions=3)
    picks = {
        tuple(sorted(
            r["title"] for r in
            xmldump.subset_pages(pages_df, [], total_docs_noise=2).collect()
        ))
        for _ in range(3)
    }
    assert len(picks) == 1          # stable across repeated plans
    ids = sorted(int(r["id_page"]) for r in pages_df.collect())[:2]
    got = sorted(
        int(r["id_page"]) for r in
        xmldump.subset_pages(pages_df, [], total_docs_noise=2).collect()
    )
    assert got == ids               # lowest page ids = dump order
