"""Streaming package: Structured Streaming surface."""
