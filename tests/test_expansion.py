"""Q3/Q4: expansion tokenization + word-sense disambiguation.

Mechanics mirror reference ``queryExpansion.py``: nltk-word_tokenize-
compatible tokenization (:136), noun_sense WSD — per-sense summed max
Wu-Palmer similarity to the other tokens' senses, strict-> argmax with
first-sense fallback (:29-68) — and the lemma cleanup rules (:146-158).
The synset/similarity inventory is the pinned fixture of
plans/expansion.py; these tests assert that the SELECTED SENSE (not
just synonym order) changes with query context.
"""

from search_engine_wikipedia_spark.plans.expansion import (
    Disambiguator,
    Expander,
    word_tokenize,
)


def test_word_tokenize_contractions_and_punct():
    # nltk.word_tokenize behavior for the query charset
    assert word_tokenize("Madam I'm Adam") == ["Madam", "I", "'m", "Adam"]
    assert word_tokenize("don't panic!") == ["do", "n't", "panic", "!"]
    assert word_tokenize("it's Steve's") == ["it", "'s", "Steve", "'s"]
    assert word_tokenize("solar energy") == ["solar", "energy"]


def test_stopword_removal_is_case_sensitive():
    # "The" survives (the NLTK list is lowercase; reference checks raw)
    e = Expander()
    assert e.stopwordRemove(["The", "the", "Maya"]) == ["The", "Maya"]


def test_wsd_first_sense_fallback_without_context():
    # zero-context ⇒ all scores 0.0 ⇒ strict > keeps synsets[0]
    assert Disambiguator.nounSenseDisambiguate(["Apple"], "Apple") \
        == "apple.n.01"
    assert Expander().expansion("Apple") == [
        "orchard", "tree", "malus", "pumila"]


def test_wsd_context_changes_sense_and_synonyms():
    # "computer" context pulls apple → company sense via Wu-Palmer
    assert Disambiguator.nounSenseDisambiguate(
        ["apple", "computer"], "apple") == "apple.n.02"
    got = Expander().expansion("apple computer")
    assert got[:4] == ["inc", "mac", "maker", "cupertino"]
    # ...and the synonym sets genuinely diverge between contexts
    assert set(Expander().expansion("Apple")).isdisjoint(got[:4])


def test_wsd_steve_jobs():
    e = Expander()
    assert Disambiguator.nounSenseDisambiguate(
        ["Steve", "Jobs"], "Jobs") == "steve_jobs.n.01"
    assert e.expansion("Steve Jobs") == [
        "stephen", "apple", "founder", "tech", "visionary"]


def test_wsd_summed_max_similarity_argmax():
    # "Mars war god": sense mars.n.02 scores 0.85+0.80, beats mars.n.01
    assert Disambiguator.nounSenseDisambiguate(
        ["Mars", "war", "god"], "Mars") == "mars.n.02"
    # "Mars robots": only mars.n.01 has a nonzero pair (0.44)
    assert Disambiguator.nounSenseDisambiguate(
        ["Mars", "robots"], "Mars") == "mars.n.01"


def test_lemma_cleanup_rules():
    # token substring removed, '_'→' ', len>2 filter, global dedup, cap 4
    got = Expander().expansion("Mean Average Precision")
    assert got == ["value", "expected", "norm", "mean",
                   "preciseness", "exactness", "accuracy"]


def test_n_per_token_cap():
    got = Expander(n_per_token=1).expansion("Least Squares")
    assert got == ["smallest", "regression"]


def test_lesk_gloss_overlap():
    assert Disambiguator.leskDisambiguate(
        ["apple", "computer", "company"], "apple") == "apple.n.02"
    assert Disambiguator.leskDisambiguate(["apple", "fruit"], "apple") \
        == "apple.n.01"
    assert Disambiguator.leskDisambiguate(["xyzzy"], "xyzzy") is None


def test_call_shape():
    text, toks = Expander()("Least Squares")
    assert toks == ["smallest", "minimal", "regression", "method",
                    "curve", "fitting"]
    assert text == "( Least Squares ) OR ( " + " OR ".join(toks) + " )^0.5"
