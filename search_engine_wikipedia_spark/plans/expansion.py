"""Query expansion (Q3/Q4) backed by a pinned synonym fixture.

The reference expands query nouns with ≤4 WordNet synonyms chosen by
word-sense disambiguation (``indexing/searching/queryExpansion.py``):
tokens are NLTK-stopword-filtered, each synonym is lowercased, has the
original token substring removed, ``_``/``-`` → space, is split, and
kept only if unseen, len>2 (``queryExpansion.py:146-158``); the
expansion group gets boost 0.5 (``:173``).

NLTK/WordNet are not installable here, so the synonym source is a
deterministic pinned table (FIXTURES.md §4) shared by engine and
oracle — rank-identity holds with expansion on or off.  The mechanics
(stopword removal, per-token cap of 4, cleanup rules, dedup across the
whole expansion, 0.5 boost) mirror the reference exactly.
"""

from __future__ import annotations

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

# Pinned synonym fixture: token (lowercase) → candidate related terms,
# already WordNet-shaped (lemma names with '_' for spaces).  Deterministic
# stand-in for wn.synsets(token).lemma_names().
SYNONYMS: dict[str, list[str]] = {
    "dna": ["deoxyribonucleic_acid", "desoxyribonucleic_acid", "genome"],
    "apple": ["orchard_apple_tree", "malus_pumila", "fruit"],
    "epigenetics": ["gene_regulation", "methylation"],
    "hollywood": ["film_industry", "tinseltown", "movie_colony"],
    "maya": ["mayan", "maia", "illusion"],
    "microsoft": ["software_giant", "redmond_company"],
    "precision": ["preciseness", "exactness", "accuracy"],
    "tuscany": ["toscana", "italian_region"],
    "balloons": ["inflatable", "airship", "party_balloon"],
    "computer": ["computing_machine", "data_processor", "calculator"],
    "programming": ["programing", "coding", "computer_programming"],
    "financial": ["fiscal", "monetary"],
    "meltdown": ["collapse", "crash", "nuclear_meltdown"],
    "justin": ["singer_justin"],
    "timberlake": ["pop_singer"],
    "least": ["smallest", "minimal"],
    "squares": ["second_power", "foursquare", "regression_method"],
    "mars": ["red_planet", "fourth_planet"],
    "robots": ["automaton", "golem", "android"],
    "page": ["leaf", "folio", "varlet"],
    "six": ["sixer", "half_dozen", "hexad"],
    "roman": ["romanic", "latin", "papistic"],
    "empire": ["imperium", "conglomerate", "dominion"],
    "solar": ["sun_powered"],
    "energy": ["free_energy", "vigour", "vim"],
    "statistical": ["statistic_based"],
    "significance": ["import", "implication", "meaning"],
    "steve": ["stephen"],
    "jobs": ["occupation", "business", "employment"],
    "triple": ["treble", "threefold", "three_base_hit"],
    "cross": ["crossbreed", "hybrid", "crucifix"],
    "constitution": ["fundamental_law", "organic_law", "establishment"],
    "eye": ["oculus", "optic", "middle"],
    "horus": ["egyptian_deity", "falcon_god"],
    "madam": ["dame", "ma'am", "gentlewoman"],
    "adam": ["ecstasy", "first_man"],
    "mean": ["average", "intend", "signify"],
    "average": ["norm", "mean_value"],
    "nobel": ["alfred_nobel"],
    "prizes": ["award", "trophy", "loot"],
    "physics": ["natural_philosophy", "physical_science"],
    "read": ["scan", "study", "interpret"],
    "manual": ["handbook", "enchiridion", "vade_mecum"],
    "spanish": ["castilian", "iberian"],
    "civil": ["civic", "polite"],
    "war": ["warfare", "conflict", "hostility"],
    "geese": ["goose", "waterfowl"],
    "god": ["deity", "divinity", "supreme_being"],
    "much": ["a_great_deal", "often"],
    "ado": ["fuss", "flurry", "bustle", "hustle"],
    "nothing": ["nil", "nix", "nada", "aught"],
}

N_PER_TOKEN = 4  # queryExpansion.py:81-92


class Expander:
    """Mirror of the reference ``Expander.__call__``/``expansion``."""

    def __init__(self, synonyms: dict[str, list[str]] | None = None,
                 n_per_token: int = N_PER_TOKEN):
        self.synonyms = SYNONYMS if synonyms is None else synonyms
        self.n_per_token = n_per_token

    def expansion(self, text: str) -> list[str]:
        tokens = [t for t in text.split() if t not in NLTK_STOPWORDS]
        res: list[str] = []
        for token in tokens:
            n = 0
            related_terms = self.synonyms.get(token.lower(), [])
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
