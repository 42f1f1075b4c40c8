"""Fixtures: reference-faithful schema declarations."""
