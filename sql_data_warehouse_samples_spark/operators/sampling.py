"""Deterministic sampling / dataset-split operators for training pipelines.

A 100 TB training corpus needs reproducible train/val/test assignment and
stratified subsampling that are (a) map-only — no shuffle, no global state,
(b) stable under repartitioning and re-runs, and (c) portable across
engines for verification.  The standard recipe: hash a stable key to a
uniform value and compare against cumulative weight thresholds.

The hash here is md5 of the seed-prefixed key rendered as text, compared in
HEX-STRING space: ``substr(md5(seed || key), 1, 8) < '<threshold>'``.
Both Spark and DuckDB produce identical lowercase-hex md5 for identical
strings, so every assignment is exactly reproducible in the DuckDB oracle
(no float rounding, no engine-specific hash).  Threshold for cumulative
weight w is ``floor(w * 16^8)`` rendered as 8 hex digits.

Contrast with ``df.sample``/``sampleBy``: those are seeded per-partition
Bernoulli draws — NOT stable under repartitioning and not reproducible in
another engine.  Keyed-hash splitting is the production-grade behavior
(same row always lands in the same split, even across corpus versions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def _threshold(cum_weight: float) -> str:
    return format(min(int(cum_weight * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _bucket_hex(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def split_assign(
    key: Column,
    weights: dict[str, float],
    seed: str = "",
) -> Column:
    """Column expression assigning a split name by keyed hash.

    ``weights`` maps split name → weight (normalized internally); iteration
    order defines the threshold order, so use a plain dict literal.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    h = _bucket_hex(key, seed)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < _threshold(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return (expr.otherwise(last) if expr is not None else last).alias("split")


def split_sql(key_expr: str, weights: dict[str, float], seed: str = "") -> str:
    """The DuckDB-oracle mirror of ``split_assign`` (identical thresholds)."""
    total = sum(weights.values())
    h = f"substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 8)"
    names = list(weights)
    parts = ["CASE"]
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        parts.append(f"WHEN {h} < '{_threshold(cum)}' THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def train_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "",
) -> DataFrame:
    """Annotate ``df`` with a deterministic ``split`` column (map-only)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_assign(F.col(key_col), weights, seed))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    strata_col: str,
    seed: str = "",
) -> DataFrame:
    """Keep ~``fractions[stratum]`` of each stratum, deterministically.

    Same keyed-hash mechanics as ``split_assign``: a row survives iff its
    hash bucket falls under its stratum's threshold — map-only, stable
    under repartitioning, reproducible across engines (unlike
    ``DataFrame.sampleBy``'s per-partition Bernoulli draws).
    """
    h = _bucket_hex(F.col(key_col), seed)
    keep = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == stratum) & (h < _threshold(frac))
        keep = cond if keep is None else keep | cond
    if keep is None:
        raise ValueError("fractions must not be empty")
    return df.filter(keep)
