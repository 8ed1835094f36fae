"""Q8: Whoosh-faithful highlight pipeline (ContextFragmenter +
BasicFragmentScorer + HtmlFormatter, top=2, order=FIRST) — golden
snippets on fixture docs, mechanics per whoosh 2.7.4 defaults."""

from search_engine_wikipedia_spark.plans.query import (
    basic_fragment_score,
    context_fragments,
    make_highlight,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"


def test_context_fragment_window_golden():
    frags = context_fragments(WORDS, {"delta"})
    assert len(frags) == 1
    f = frags[0]
    # before-context: 20 chars of token text kept ahead of the hit
    # (alpha+bravo+charlie = 17 ≤ 20); fragment opens at startchar-20→0.
    assert f.startchar == 0
    # countdown = 20 + (20-17) unused-before = 23 token chars after the
    # hit: echo(4)+foxtrot(7)+golf(4)+hotel(5)=20 → expires at "hotel";
    # fragment closes at hotel.end+20 = 69.
    assert f.endchar == 69
    assert [t[0] for t in f.matches] == ["delta"]


def test_make_highlight_golden_markup():
    got = make_highlight(WORDS, ["delta"])
    expected = (
        WORDS[0:20]
        + '<b class="match term0">delta</b>'
        + WORDS[25:69]
    )
    assert got == expected


def test_scorer_favors_distinct_terms():
    # 2 distinct terms (2 matches) = 2·(2·100) = 400 beats
    # 3 repeats of one term = 3·(1·100) = 300
    two_distinct = "xx yy alpha beta zz"
    three_same = "alpha qq alpha rr alpha"
    f2 = context_fragments(two_distinct, {"alpha", "beta"})
    f3 = context_fragments(three_same, {"alpha"})
    assert basic_fragment_score(f2[0]) == 400.0
    assert basic_fragment_score(f3[0]) == 300.0


def test_top2_selected_by_score_then_ordered_by_position():
    # frag A (1 term) ... frag B (2 distinct terms) ... frag C (1 term),
    # far apart so they can't merge.  top=2 keeps B + one single-hit
    # fragment; output is position-ordered and '...'-joined.
    filler = " ".join(["pad%02d" % i for i in range(12)])  # > surround
    text = f"alpha {filler} beta gamma {filler} alpha {filler}"
    got = make_highlight(text, ["alpha", "beta", "gamma"], top=2)
    assert got.count("...") == 1
    first, second = got.split("...")
    # highest-scoring (2-distinct) fragment is second by position but
    # selected; the first single-hit fragment (earlier position) leads.
    assert '<b class="match term0">alpha</b>' in first
    assert "beta" in second and "gamma" in second


def test_term_class_numbering_per_distinct_original_text():
    text = "alpha beta alpha"
    got = make_highlight(text, ["alpha", "beta"])
    assert got == (
        '<b class="match term0">alpha</b> '
        '<b class="match term1">beta</b> '
        '<b class="match term0">alpha</b>'
    )


def test_stemmed_match_and_stopword_skip():
    # query term arrives stemmed ("run" ← running); stopwords are not
    # tokenized so they can't match or count toward window lengths
    text = "the running of the bulls"
    got = make_highlight(text, ["run"])
    assert '<b class="match term0">running</b>' in got


def test_empty_inputs():
    assert make_highlight("", ["x"]) == ""
    assert make_highlight("some text", []) == ""
    assert make_highlight("no hits here at all", ["zzz"]) == ""


def test_stem_variants_share_termclass_and_html_is_escaped():
    """HtmlFormatter parity: the termN class counter keys on the
    ANALYZED token text (whoosh keys ``seen`` on t.text), so
    stem-equal surface variants share one class; and both matched
    tokens and inter-match text are html-escaped (& < > only)."""
    text = "runs & <running>"
    got = make_highlight(text, ["run"])
    assert got == (
        '<b class="match term0">runs</b> &amp; &lt;'
        '<b class="match term0">running</b>&gt;'
    )
