"""Operators package: dedup, similarity, text analysis, multimodal."""
