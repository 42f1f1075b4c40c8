"""Mergeable corpus profiles: per-group stats + HLL distinct-token sketches.

Corpus curation wants "how many distinct tokens / documents per source" on
every increment WITHOUT rescanning the accumulated 100 TB.  Exact
``COUNT(DISTINCT token)`` re-aggregates the world each time; the standard
fix is a mergeable sketch: profile each increment once, persist the
sketches, and fold new increments in with a sketch union — the same
pattern the reference's incremental statistics maintenance follows
(UPDATE STATISTICS per load, SURVEY §2.9 D11/D12), upgraded from row
counts to distinct-cardinality state.

Built entirely on Spark's Apache DataSketches HLL aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) — JVM
declarative aggregates with map-side partial combine, so profiling is one
shuffle keyed by the group columns and union is one shuffle over sketch
BLOBs (bytes per group, never rows).

No DuckDB oracle: the sketch binary is DataSketches-specific.  Correctness
is pytest-proven instead: estimates within the published HLL error bound
of the exact count, and ``merge`` of per-increment profiles returning the
IDENTICAL estimate to a single full-corpus profile (sketch union is
lossless over partitioning — the property that makes incremental profiling
sound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: log2(m) for the HLL sketch: 2^12 registers ≈ 1.6% relative standard
#: error at ~4 KB per group — the DataSketches default.
DEFAULT_LG_K = 12


def token_profile(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Profile one corpus (increment): per group — document count, token
    count, and an HLL sketch of distinct tokens.

    One explode + one grouped aggregate; the explode's shuffle carries
    (group, token) pairs but the HLL agg combines map-side, so reducer
    input is sketch partials, not the token stream."""
    toks = df.select(*group_cols, F.explode(tokens(text_col)).alias("__tok"))
    sketch = toks.groupBy(*group_cols).agg(
        F.hll_sketch_agg("__tok", F.lit(lg_k)).alias("token_sketch"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    return counts.join(sketch, group_cols)


def merge_profiles(profiles: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Fold per-increment profiles into one: sums for the counters, a
    lossless HLL union for the sketches.  Cost scales with the NUMBER OF
    GROUPS, not the corpus — this is the incremental path."""
    if not profiles:
        raise ValueError("no profiles to merge")
    allp = profiles[0]
    for p in profiles[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy(*group_cols).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.hll_union_agg("token_sketch").alias("token_sketch"),
    )


def estimate(profile: DataFrame) -> DataFrame:
    """Readable view of a profile: sketch → distinct-token estimate."""
    return profile.select(
        *[c for c in profile.columns if c != "token_sketch"],
        F.hll_sketch_estimate("token_sketch").alias("approx_distinct_tokens"),
    )
