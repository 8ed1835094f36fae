"""PySpark-native full-text analytics engine.

A brand-new, Spark-first reimplementation of the capabilities of the
reference engine ``GabrieleSavoia/search-engine-wikipedia`` (a Whoosh +
SNAP Wikipedia search engine):

* wikitext cleaning + internal-link extraction (reference
  ``indexing/xmlParsing/filterText.py``) as vectorized pandas UDFs,
* Whoosh-compatible analyzers (tokenize / lowercase / stopwords /
  Porter stemming; reference ``indexing/analysis/analyzers.py``),
* distributed inverted-index build: per-partition SPIMI segments with
  delta + variable-byte compressed posting lists and block-max
  metadata, salted global merge (reference ``indexing/index.py``),
* BM25F / TF-IDF / Frequency top-k scoring with block-max WAND
  (reference ``indexing/searching/searcher.py``),
* PageRank prior over the internal-link graph, blended into the final
  score exactly as the reference does (reference
  ``indexing/pageRank/graph.py``),
* query expansion via a pinned synonym fixture (reference
  ``indexing/searching/queryExpansion.py``; WordNet is not available),
* the full IR evaluation suite (reference ``indexing/evaluation.py``),
* plus large-scale training-data pipeline operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text quality analysis, and multimodal-column plumbing.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo, and published IR papers (SPIMI,
block-max WAND, PageRank).
"""

__version__ = "0.1.0"
