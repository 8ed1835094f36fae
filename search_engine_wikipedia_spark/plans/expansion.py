"""Query expansion (Q3) with word-sense disambiguation (Q4).

Re-derivation of the reference expansion pipeline
(``indexing/searching/queryExpansion.py``), selected with
``disambiguate_fn='noun_sense'`` at ``searcher.py:51``:

1. ``nltk.word_tokenize(text)`` then NLTK-stopword removal
   (``queryExpansion.py:136``; case-sensitive membership test — "The"
   survives because the list is lowercase),
2. per token, **word-sense disambiguation** over its noun synsets:

   * ``noun_sense`` (``queryExpansion.py:29-68``): for each candidate
     sense TxSi of token Tx, score(TxSi) = Σ over other tokens Ty of
     max over Ty's senses TySz of wup_similarity(TxSi, TySz); pick the
     argmax with a strict ``>`` against an initial best of
     (synsets[0], 0.0) — ties and all-zero contexts fall back to the
     FIRST (most frequent) sense, exactly as the reference does,
   * ``lesk`` (``queryExpansion.py:15-27`` → nltk.wsd.lesk): argmax
     over senses of |context ∩ gloss tokens| (first argmax wins, as
     Python ``max`` does),

3. the chosen sense's lemma names, NLTK-stopword-filtered
   (``getRelatedTerms``, ``queryExpansion.py:106-120``),
4. per-lemma cleanup (``:146-158``): lowercase, remove the original
   token substring, ``_``/``-`` → space, split; keep unseen terms of
   len>2, at most ``n_per_token=4`` per query token,
5. the expansion group joins the parse tree with boost 0.5 (``:173``).

NLTK/WordNet are not installable in this environment, so the synset
inventory, lemma names, Wu-Palmer similarities and lesk glosses are a
deterministic pinned fixture (FIXTURES.md §4) shared by the engine and
the test oracle — the *mechanics* (tokenization rule, WSD argmax
order, cleanup, caps, boosts) mirror the reference exactly, and the
fixture includes genuinely ambiguous tokens whose selected sense (and
therefore synonym set) depends on the other query tokens.
"""

from __future__ import annotations

import re

# Standard NLTK English stopword list (public domain corpus; the
# reference loads it at queryExpansion.py:92).
NLTK_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself
it it's its itself they them their theirs themselves what which who whom
this that that'll these those am is are was were be been being have has
had having do does did doing a an the and but if or because as until
while of at by for with about against between into through during before
after above below to from up down in out on off over under again further
then once here there all any both each few more most other some such no
nor not only own same so than too very s t can will just don don't
should should've now d ll m o re ve y ain aren aren't couldn couldn't
didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't isn
isn't ma mightn mightn't mustn mustn't needn needn't shan shan't shouldn
shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())


# ---------------------------------------------------------------------------
# nltk.word_tokenize-compatible tokenizer (queryExpansion.py:136)
# ---------------------------------------------------------------------------
_PUNCT_SPLIT = re.compile(r"([^\w\s'])")       # isolate non-' punctuation
_CONTR_NT = re.compile(r"(?i)(\w)(n't)\b")     # don't  -> do n't
_CONTR_APO = re.compile(r"(?i)(\w)('(?:s|m|d|ll|re|ve))\b")  # I'm -> I 'm


def word_tokenize(text: str) -> list[str]:
    """Treebank-style tokenization: punctuation isolated, ASCII-apostrophe
    contractions split (``I'm`` → ``I``, ``'m``; ``don't`` → ``do``,
    ``n't``) — the nltk.word_tokenize behavior for the query character
    set (full Treebank sentence-final-period handling is out of scope
    for single-line queries)."""
    s = _PUNCT_SPLIT.sub(r" \1 ", text)
    s = _CONTR_NT.sub(r"\1 \2", s)
    s = _CONTR_APO.sub(r"\1 \2", s)
    return s.split()


# ---------------------------------------------------------------------------
# Pinned WordNet-shaped fixture: synsets, lemmas, Wu-Palmer, glosses.
#
# SYNSETS maps a lowercase token to its noun senses in WordNet order
# (senses[0] = most frequent, the all-zero-context fallback).  Lemma
# lists start with the headword (as wn lemma_names() do) — the cleanup
# step removes the original-token substring, so the headword vanishes
# from the expansion exactly as with real WordNet.
#
# Ambiguous tokens (sense choice depends on query context via WUP):
#   apple   — fruit vs computer company   ("Apple" vs "apple computer")
#   jobs    — occupation vs Steve Jobs    ("Steve Jobs")
#   mean    — statistic vs intention      ("Mean Average Precision")
#   squares — geometry vs least-squares   ("Least Squares")
#   mars    — planet vs roman god         ("Mars robots")
# ---------------------------------------------------------------------------
SYNSETS: dict[str, tuple[str, ...]] = {
    "dna": ("dna.n.01",),
    "apple": ("apple.n.01", "apple.n.02"),
    "epigenetics": ("epigenetics.n.01",),
    "hollywood": ("hollywood.n.01",),
    "maya": ("maya.n.01", "maya.n.02"),
    "microsoft": ("microsoft.n.01",),
    "precision": ("precision.n.01",),
    "tuscany": ("tuscany.n.01",),
    "balloons": ("balloon.n.01",),
    "computer": ("computer.n.01",),
    "programming": ("programming.n.01",),
    "financial": ("financial.n.01",),
    "meltdown": ("meltdown.n.01",),
    "justin": ("justin.n.01",),
    "timberlake": ("timberlake.n.01",),
    "least": ("least.n.01",),
    "squares": ("square.n.01", "least_squares.n.01"),
    "mars": ("mars.n.01", "mars.n.02"),
    "robots": ("robot.n.01",),
    "page": ("page.n.01",),
    "six": ("six.n.01",),
    "roman": ("roman.n.01",),
    "empire": ("empire.n.01",),
    "solar": ("solar.n.01",),
    "energy": ("energy.n.01",),
    "statistical": ("statistical.n.01",),
    "significance": ("significance.n.01",),
    "steve": ("stephen.n.01",),
    "jobs": ("job.n.01", "steve_jobs.n.01"),
    "triple": ("triple.n.01",),
    "cross": ("cross.n.01",),
    "constitution": ("constitution.n.01",),
    "eye": ("eye.n.01",),
    "horus": ("horus.n.01",),
    "madam": ("madam.n.01",),
    "adam": ("adam.n.01",),
    "mean": ("mean.n.01", "mean.n.02"),
    "average": ("average.n.01",),
    "nobel": ("nobel.n.01",),
    "prizes": ("prize.n.01",),
    "physics": ("physics.n.01",),
    "read": ("read.n.01",),
    "manual": ("manual.n.01",),
    "spanish": ("spanish.n.01",),
    "civil": ("civil.n.01",),
    "war": ("war.n.01",),
    "geese": ("goose.n.01",),
    "god": ("god.n.01",),
    "much": ("much.n.01",),
    "ado": ("ado.n.01",),
    "nothing": ("nothing.n.01",),
}

SENSE_LEMMAS: dict[str, tuple[str, ...]] = {
    "dna.n.01": ("dna", "deoxyribonucleic_acid", "desoxyribonucleic_acid",
                 "genome"),
    "apple.n.01": ("apple", "orchard_apple_tree", "malus_pumila", "fruit"),
    "apple.n.02": ("apple", "apple_inc", "mac_maker", "cupertino_firm"),
    "epigenetics.n.01": ("epigenetics", "gene_regulation", "methylation"),
    "hollywood.n.01": ("hollywood", "film_industry", "tinseltown",
                       "movie_colony"),
    "maya.n.01": ("maya", "mayan", "maia"),
    "maya.n.02": ("maya", "illusion"),
    "microsoft.n.01": ("microsoft", "software_giant", "redmond_company"),
    "precision.n.01": ("precision", "preciseness", "exactness", "accuracy"),
    "tuscany.n.01": ("tuscany", "toscana", "italian_region"),
    "balloon.n.01": ("balloons", "inflatable", "airship", "party_balloon"),
    "computer.n.01": ("computer", "computing_machine", "data_processor",
                      "calculator"),
    "programming.n.01": ("programming", "programing", "coding",
                         "computer_programming"),
    "financial.n.01": ("financial", "fiscal", "monetary"),
    "meltdown.n.01": ("meltdown", "collapse", "crash", "nuclear_meltdown"),
    "justin.n.01": ("justin", "singer_justin"),
    "timberlake.n.01": ("timberlake", "pop_singer"),
    "least.n.01": ("least", "smallest", "minimal"),
    "square.n.01": ("squares", "second_power", "foursquare"),
    "least_squares.n.01": ("squares", "regression_method", "curve_fitting"),
    "mars.n.01": ("mars", "red_planet", "fourth_planet"),
    "mars.n.02": ("mars", "war_god", "ares_counterpart"),
    "robot.n.01": ("robots", "automaton", "golem", "android"),
    "page.n.01": ("page", "leaf", "folio", "varlet"),
    "six.n.01": ("six", "sixer", "half_dozen", "hexad"),
    "roman.n.01": ("roman", "romanic", "latin", "papistic"),
    "empire.n.01": ("empire", "imperium", "conglomerate", "dominion"),
    "solar.n.01": ("solar", "sun_powered"),
    "energy.n.01": ("energy", "free_energy", "vigour", "vim"),
    "statistical.n.01": ("statistical", "statistic_based"),
    "significance.n.01": ("significance", "import", "implication", "meaning"),
    "stephen.n.01": ("steve", "stephen"),
    "job.n.01": ("jobs", "occupation", "business", "employment"),
    "steve_jobs.n.01": ("jobs", "apple_founder", "tech_visionary"),
    "triple.n.01": ("triple", "treble", "threefold", "three_base_hit"),
    "cross.n.01": ("cross", "crossbreed", "hybrid", "crucifix"),
    "constitution.n.01": ("constitution", "fundamental_law", "organic_law",
                          "establishment"),
    "eye.n.01": ("eye", "oculus", "optic", "middle"),
    "horus.n.01": ("horus", "egyptian_deity", "falcon_god"),
    "madam.n.01": ("madam", "dame", "ma'am", "gentlewoman"),
    "adam.n.01": ("adam", "ecstasy", "first_man"),
    "mean.n.01": ("mean", "mean_value", "expected_value"),
    "mean.n.02": ("mean", "intend", "signify"),
    "average.n.01": ("average", "norm", "mean_value"),
    "nobel.n.01": ("nobel", "alfred_nobel"),
    "prize.n.01": ("prizes", "award", "trophy", "loot"),
    "physics.n.01": ("physics", "natural_philosophy", "physical_science"),
    "read.n.01": ("read", "scan", "study", "interpret"),
    "manual.n.01": ("manual", "handbook", "enchiridion", "vade_mecum"),
    "spanish.n.01": ("spanish", "castilian", "iberian"),
    "civil.n.01": ("civil", "civic", "polite"),
    "war.n.01": ("war", "warfare", "conflict", "hostility"),
    "goose.n.01": ("geese", "goose", "waterfowl"),
    "god.n.01": ("god", "deity", "divinity", "supreme_being"),
    "much.n.01": ("much", "a_great_deal", "often"),
    "ado.n.01": ("ado", "fuss", "flurry", "bustle", "hustle"),
    "nothing.n.01": ("nothing", "nil", "nix", "nada", "aught"),
}

# Symmetric Wu-Palmer similarities (missing pair → 0.0).  Only pairs
# that make a context discriminate between senses need entries.
_WUP_PAIRS: dict[tuple[str, str], float] = {
    ("apple.n.02", "computer.n.01"): 0.86,
    ("apple.n.02", "microsoft.n.01"): 0.90,
    ("apple.n.01", "goose.n.01"): 0.32,     # both organisms — weak
    ("steve_jobs.n.01", "stephen.n.01"): 0.92,
    ("job.n.01", "manual.n.01"): 0.20,
    ("mean.n.01", "average.n.01"): 0.95,
    ("mean.n.01", "precision.n.01"): 0.60,
    ("mean.n.02", "read.n.01"): 0.30,
    ("least_squares.n.01", "least.n.01"): 0.88,
    ("square.n.01", "triple.n.01"): 0.35,
    ("mars.n.01", "robot.n.01"): 0.44,
    ("mars.n.02", "war.n.01"): 0.85,
    ("mars.n.02", "god.n.01"): 0.80,
}
WUP: dict[tuple[str, str], float] = {}
for (_a, _b), _v in _WUP_PAIRS.items():
    WUP[(_a, _b)] = _v
    WUP[(_b, _a)] = _v

# Lesk glosses (sense definitions, used by disambiguate_fn='lesk').
GLOSSES: dict[str, str] = {
    "apple.n.01": "fruit with red or yellow or green skin and sweet "
                  "to tart crisp whitish flesh",
    "apple.n.02": "american computer company that makes personal "
                  "computers and phones",
    "job.n.01": "the principal activity in your life that you do to "
                "earn money",
    "steve_jobs.n.01": "founder of the apple computer company",
    "mean.n.01": "an average of n numbers computed by adding some "
                 "function of the numbers and dividing by some function "
                 "of n",
    "mean.n.02": "have as a logical consequence or intend to convey",
    "square.n.01": "the product of two equal terms",
    "least_squares.n.01": "a method of fitting a curve to data points "
                          "so as to minimize the sum of the squares of "
                          "the distances of the points from the curve",
    "mars.n.01": "a small reddish planet that is the 4th from the sun",
    "mars.n.02": "roman god of war and agriculture",
    "maya.n.01": "a member of an american indian people of yucatan",
    "maya.n.02": "illusion or appearance in hindu philosophy",
}


def wup_similarity(sense_a: str, sense_b: str) -> float:
    """Pinned stand-in for ``Synset.wup_similarity`` (symmetric)."""
    return WUP.get((sense_a, sense_b), 0.0)


def _senses(token: str) -> tuple[str, ...]:
    """wn.synsets(token, wn.NOUN) stand-in (morphy lowercases)."""
    return SYNSETS.get(token.lower(), ())


class Disambiguator:
    """Mirror of the reference ``Disambiguator`` (queryExpansion.py:13-68)."""

    @classmethod
    def leskDisambiguate(cls, tokens, index_term):
        """nltk.wsd.lesk(tokens, index_term, 'n'): argmax over senses of
        |context ∩ gloss tokens|, first argmax winning (Python max)."""
        senses = _senses(index_term)
        if not senses:
            return None
        context = {t.lower() for t in tokens}
        return max(
            senses,
            key=lambda s: len(context & set(GLOSSES.get(s, "").split())),
        )

    @classmethod
    def nounSenseDisambiguate(cls, tokens, index_term):
        """queryExpansion.py:29-68 verbatim mechanics: score each sense
        TxSi of Tx as Σ_{Ty≠Tx} max_{TySz} wup(TxSi, TySz); strict-``>``
        argmax with initial best = (synsets[0], 0.0)."""
        Tx = index_term
        senses = _senses(Tx)
        if not senses:  # token not in WordNet
            return None
        best_sense = senses[0]
        best_score = 0.0
        for TxSi in senses:
            score_TxSi = 0.0
            for Ty in tokens:
                if Ty == Tx:
                    continue
                max_score = 0.0
                for TySz in _senses(Ty):
                    tmp_score = wup_similarity(TxSi, TySz)
                    if tmp_score > max_score:
                        max_score = tmp_score
                score_TxSi += max_score
            if score_TxSi > best_score:
                best_score = score_TxSi
                best_sense = TxSi
        return best_sense


N_PER_TOKEN = 4  # queryExpansion.py:81-92


class Expander:
    """Mirror of the reference ``Expander`` (queryExpansion.py:71-174)."""

    disambiguate_fn_map = {
        "lesk": Disambiguator.leskDisambiguate,
        "noun_sense": Disambiguator.nounSenseDisambiguate,
    }

    def __init__(self, disambiguate_fn: str = "noun_sense",
                 n_per_token: int = N_PER_TOKEN):
        # the reference searcher selects 'noun_sense' (searcher.py:51)
        self.disambiguate_fn = Expander.disambiguate_fn_map[disambiguate_fn]
        self.n_per_token = n_per_token
        self.stopword = NLTK_STOPWORDS

    def stopwordRemove(self, tokens: list[str]) -> list[str]:
        """Case-sensitive membership, as the reference's list check."""
        return [t for t in tokens if t not in self.stopword]

    def getRelatedTerms(self, best_sense: str | None) -> list[str]:
        if best_sense is not None:
            return self.stopwordRemove(list(SENSE_LEMMAS[best_sense]))
        return []

    def expansion(self, text: str) -> list[str]:
        tokens = self.stopwordRemove(word_tokenize(text))
        res: list[str] = []
        for token in tokens:
            n = 0
            best_sense = self.disambiguate_fn(tokens, token)
            related_terms = self.getRelatedTerms(best_sense)
            for related_term in related_terms:
                related_term = related_term.lower().replace(token.lower(), "")
                related_term = related_term.replace("_", " ").replace("-", " ")
                related_term = related_term.strip()
                for term in related_term.split():
                    if term not in res and len(term) > 2 and term.strip() != "":
                        if n < self.n_per_token:
                            res.append(term)
                            n += 1
        return res

    def __call__(self, text: str):
        """→ (expanded_text, expansion_tokens) à la queryExpansion.py:161-174."""
        toks = self.expansion(text)
        expanded = "( " + text + " ) OR ( " + " OR ".join(toks) + " )^0.5"
        return expanded, toks
