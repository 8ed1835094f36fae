"""Golden tests for cleaner / link extractor / analyzers / Porter stemmer.

The cleaner goldens were produced by hand-executing the reference regex
list (``/root/reference/indexing/xmlParsing/filterText.py:143-174``) —
one pair per replacement rule, plus adversarial combinations.
"""

from search_engine_wikipedia_spark.functions import textproc
from search_engine_wikipedia_spark.functions.porter import stem


# ---------------------------------------------------------------------------
# Porter stemmer — vectors from the published algorithm description
# (tartarus.org/~martin/PorterStemmer), which Whoosh's bundled stemmer
# implements.
# ---------------------------------------------------------------------------
PORTER_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # general
    "fundamentally": "fundament", "empires": "empir", "empire": "empir",
    "roman": "roman", "fortified": "fortifi",
}


def test_porter_vectors():
    for word, expected in PORTER_VECTORS.items():
        assert stem(word) == expected, f"{word} -> {stem(word)} != {expected}"


def test_porter_short_words_unchanged():
    for w in ["a", "is", "be", "ox"]:
        assert stem(w) == w


def test_porter_y_first_letter():
    # first 'y' is masked during stemming and restored after
    assert stem("yelling") == "yell"
    assert stem("young") == "young"


# ---------------------------------------------------------------------------
# Cleaner (T1) — one golden per rule of filterText.py:143-174.
# Expected strings hand-derived from the reference regex semantics.
# ---------------------------------------------------------------------------
CLEANER_GOLDENS = [
    # {{..url=..}}
    ("x {{cite web|url=http://a.b}} y", "x  y"),
    # {{..lang..}}
    ("x {{lang-en|Rome}} y", "x  y"),
    # {{..reflist..}}
    ("x {{reflist|30em}} y", "x  y"),
    # {{..commons..}}
    ("x {{commons category}} y", "x  y"),
    # {{..coord..}}
    ("x {{coord|41|54|N}} y", "x  y"),
    # [http..]
    ("see [http://ex.com site] end", "see  end"),
    # \shttp..\s : ' http://x.y ' consumed including both spaces
    ("a http://x.y b", "ab"),
    # word.com (the match consumes the leading space and trailing space)
    ("go example.com now", "gonow"),
    # word.org
    ("go example.org now", "gonow"),
    # .it / .en
    ("go sito.it now", "gonow"),
    ("go page.en now", "gonow"),
    # gallery (DOTALL spans newlines)
    ("a <gallery>f1\nf2</gallery> b", "a  b"),
    # [[File:..]]
    ("a [[File:pic.png|thumb]] b", "a  b"),
    # [[Media:..]]
    ("a [[Media:clip.ogg]] b", "a  b"),
    # html tags
    ("a <ref name=x/> b <b>bold</b>", "a  b bold"),
    # literal char rules: [ ] { } / removed; : | = -> space; * removed
    ("[[Rome|city]] a/b x:y p|q m=n *item",
     "Rome city ab x y p q m n item"),
    # internal links kept (only brackets stripped)
    ("The [[Roman Empire]] era", "The Roman Empire era"),
]


def test_cleaner_goldens():
    for src, expected in CLEANER_GOLDENS:
        assert textproc.clean_wikitext(src) == expected, repr(src)


def test_cleaner_is_ordered():
    # [[File:...]] must be removed BEFORE the bare-bracket rules run;
    # otherwise 'File:pic.png' text would survive.
    assert "File" not in textproc.clean_wikitext("[[File:pic.png]]")
    # but a File link nested after a gallery is still caught
    s = "<gallery>x</gallery>[[File:y.png]]tail"
    assert textproc.clean_wikitext(s) == "tail"


def test_cleaner_series_matches_scalar():
    import pandas as pd

    srcs = [g[0] for g in CLEANER_GOLDENS]
    out = textproc.clean_wikitext_series(pd.Series(srcs)).tolist()
    assert out == [g[1] for g in CLEANER_GOLDENS]


# ---------------------------------------------------------------------------
# Link extractor (T2) — rules of filterText.py:49-118
# ---------------------------------------------------------------------------
def test_links_basic_and_display():
    r = textproc.extract_links("a [[Rome|the city]] b [[Milan]]", "Page")
    assert r["links"] == ["Rome", "Milan"]


def test_links_section_and_self():
    r = textproc.extract_links("[[#Intro]] [[Page]] [[Other#Sec]]", "Page")
    assert r["links"] == ["Other"]


def test_links_subpage_resolution():
    # '[[/sub]]': r'/\s*?$' strips only a TRAILING slash ('/sub' has
    # none), then startswith('/') → title + '/sub' = 'P/sub'; only ':'
    # chars are removed from kept links, so the inner '/' survives.
    r = textproc.extract_links("[[/sub]]", "P")
    assert r["links"] == ["P/sub"]


def test_links_category():
    r = textproc.extract_links("[[Category:Empires]]", "P")
    assert r["categories"] == ["Category:Empires"]
    assert r["links"] == []


def test_links_dropped_prefixes():
    r = textproc.extract_links(
        "[[{{var}}]] [[Image:x.png]] [[Manual:y]] [[Extension:z]]", "P"
    )
    assert r["links"] == []


def test_links_interwiki_and_namespace():
    r = textproc.extract_links("[[wikt:word]] [[Talk:Rome]] [[de:Rom]]", "P")
    assert r["links"] == []


def test_links_colon_title_kept():
    # ':Article' is equivalent to 'Article'; colons are stripped
    r = textproc.extract_links("[[:Article]]", "P")
    assert r["links"] == ["Article"]
    # 'Weird:Title' where 'Weird' is no interwiki/ns → kept, colon stripped
    r = textproc.extract_links("[[Weird:Title]]", "P")
    assert r["links"] == ["WeirdTitle"]


# ---------------------------------------------------------------------------
# Analyzers
# ---------------------------------------------------------------------------
def test_tokenizer_pattern():
    # \w+(\.?\w+)* keeps inner dots, splits on other punctuation
    assert textproc.tokenize_simple("U.S.A. web-scale 99 balloons!") == [
        "u.s.a", "web", "scale", "99", "balloons",
    ]


def test_analyze_title_stopwords_and_minsize():
    assert textproc.analyze_title("The Empire of a I") == ["empire"]
    # '99' kept (len 2, not a stopword)
    assert textproc.analyze_title("99 balloons") == ["99", "balloons"]


def test_analyze_text_stems():
    assert textproc.analyze_text("Fortified Roman Empires") == [
        "fortifi", "roman", "empir",
    ]
    # stopwords removed before stemming
    assert textproc.analyze_text("it is the running") == ["run"]


def test_multifield_example_from_reference():
    # searcher.py:40-41 comment: 'fortified' → text:fortifi OR title:fortified
    assert textproc.analyze_text("fortified") == ["fortifi"]
    assert textproc.analyze_title("fortified") == ["fortified"]


# ---------------------------------------------------------------------------
# A4 / A5 analyzers
# ---------------------------------------------------------------------------
def test_accent_stemming_analyzer():
    # A4 = A3 then accent fold (CharsetFilter runs AFTER StemFilter)
    assert textproc.analyze_text_accent("Café naïve résumé") == [
        "cafe", "naiv", "resume"]
    # identical to A3 on plain ASCII
    s = "The running foxes jumped"
    assert textproc.analyze_text_accent(s) == textproc.analyze_text(s)


def test_lemmatizing_analyzer():
    # A5 = tokenize, lowercase, stop/minsize, noun lemmatize (no stem)
    assert textproc.analyze_text_lemma("the geese and wolves ran") == [
        "goose", "wolf", "ran"]
    assert textproc.analyze_text_lemma("boxes churches books") == [
        "box", "church", "book"]
    assert textproc.lemmatize_noun("cities") == "city"
    assert textproc.lemmatize_noun("bus") == "bus"       # -us guard
    assert textproc.lemmatize_noun("glass") == "glass"   # -ss guard
    assert textproc.lemmatize_noun("analysis") == "analysis"  # -is guard
    assert textproc.lemmatize_noun("criteria") == "criterion"


def test_lemmatizer_exceptions_come_from_vendored_noun_exc():
    """A5's irregular-noun table is real WordNet data: the vendored
    WNdb ``noun.exc`` extract is merged over the builtin table at
    import, so pairs the builtin lacks (corpora, genera, larvae, ...)
    lemmatize correctly — and the file is checked in (deterministic
    analyzer output per repo version), not environment-resolved."""
    import os

    assert os.path.exists(textproc._VENDORED_NOUN_EXC)
    # file-only pairs (absent from the builtin table)
    for infl, base in (("corpora", "corpus"), ("genera", "genus"),
                       ("larvae", "larva"), ("stimuli", "stimulus"),
                       ("vortices", "vortex")):
        assert infl not in textproc._BUILTIN_NOUN_EXCEPTIONS
        assert textproc.lemmatize_noun(infl) == base
    # builtin pairs still hold (file and builtin agree where both list)
    assert textproc.lemmatize_noun("geese") == "goose"


def test_analyzer_registry_complete():
    assert set(textproc.ANALYZERS) == {
        "text", "title", "simple", "text_accent", "text_lemma"}


def test_build_with_alternate_analyzer(spark, tmp_path):
    """IndexBuilder accepts any registry analyzer (A4 here): accented
    terms land folded in the index vocabulary."""
    import pandas as pd

    from search_engine_wikipedia_spark import schemas
    from search_engine_wikipedia_spark.operators.build import IndexBuilder
    from search_engine_wikipedia_spark.sources import catalog

    pages = spark.createDataFrame(pd.DataFrame([
        {"url": "https://x/Caf%C3%A9", "warc_ts": None, "html": None,
         "text": "Café culture thrives in cafés", "lang": "en"},
    ]), schema=schemas.PAGES)
    root = str(tmp_path / "idx_a4")
    IndexBuilder(spark, root, n_segments=1, shard_size=100,
                 text_analyzer="text_accent").build(pages, resume=False)
    terms = {
        r["term"] for r in
        catalog.read_table(spark, root, "postings")
        .where("field = 'text'").select("term").collect()
    }
    assert "cafe" in terms and "café" not in terms
    # the analyzer choice is recorded in the index and applied on the
    # QUERY path too: an accented query folds to the same vocabulary
    from search_engine_wikipedia_spark.plans.query import (
        SearchIndex, WikiSearcher,
    )

    idx = SearchIndex(spark, root)
    assert idx.analyzer_names["text_analyzer"] == "text_accent"
    res = WikiSearcher(idx).search("cafés", limit=5, exp=False,
                                   page_rank=False, with_meta=True)
    assert len(res["docs"]) == 1
    assert "<b" in res["docs"][0]["highlight"]  # highlighter folds too
