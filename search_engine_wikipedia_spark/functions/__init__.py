"""Scalar/vectorized kernels: analyzers, cleaner, porter, codecs, text stats."""
