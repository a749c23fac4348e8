"""Vectorized column functions: fingerprints, text analysis, vector math."""
