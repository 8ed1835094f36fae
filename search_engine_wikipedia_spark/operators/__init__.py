"""Distributed operators: index build, merge, WAND, PageRank, dedup, ANN."""
