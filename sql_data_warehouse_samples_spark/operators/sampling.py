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


def quota_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str | list[str],
    k: int,
    seed: str = "",
) -> DataFrame:
    """Keep EXACTLY min(k, |stratum|) rows per stratum, deterministically.

    Rows rank within their stratum by the keyed md5 hash (tie-broken by the
    key itself, so the selected set is total-order stable); the first ``k``
    survive.  Unlike ``stratified_sample``'s fraction thresholds this gives
    hard per-group quotas — the standard shape for building bounded eval
    sets ("500 docs per (source, lang)") or per-class caps on skewed
    corpora.

    Scale shape: one hash-partitioned shuffle on the strata columns; the
    rank window never sees more than one stratum per partition, and with
    k ≪ |stratum| the post-filter collapses immediately.  For quotas over
    very-high-cardinality single strata (one group = one partition's worth
    of rows) the same pattern applies per-band after salting; at the
    typical (source, lang) grain partitions stay balanced.  Deterministic
    and repartition-stable: the hash depends only on (seed, key), never on
    physical placement.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    strata = [strata_col] if isinstance(strata_col, str) else list(strata_col)
    h = _bucket_hex(F.col(key_col), seed)
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# --- domain-mixture sampling (training-data curation) ----------------------


def mixture_rates(
    counts: dict[str, int], target_shares: dict[str, float], budget_rows: int
) -> dict[str, float]:
    """Per-source keep rates hitting a target domain mixture.

    ``target_shares`` is the desired post-sample composition (normalized
    internally — the Pile/DoReMi-style domain-weights vector); ``budget_rows``
    the total sample size.  A source whose quota exceeds its population is
    capped at 1.0 (kept whole, like upsampling-free mixture construction);
    sources absent from ``target_shares`` get rate 0 (dropped)."""
    total = sum(target_shares.values())
    if total <= 0:
        raise ValueError("target shares must sum to a positive value")
    out = {}
    for s, share in target_shares.items():
        cnt = counts.get(s, 0)
        if cnt > 0:
            # evaluation order matters: the SQL mirror reproduces this
            # exact double arithmetic for bit-identical thresholds
            out[s] = min(share / total * budget_rows / cnt, 1.0)
    return out


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    target_shares: dict[str, float],
    budget_rows: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic domain-mixture sample: ~``budget_rows`` rows whose
    source composition matches ``target_shares``.

    Two stages, both scale-safe: (1) per-source counts — one partial-agg
    shuffle of #sources rows, collected driver-side (domains are dozens,
    not data-sized); (2) a map-only keyed-hash filter with per-source
    thresholds, stable under repartitioning and reproducible in the DuckDB
    oracle (``mixture_sql``).  No sort, no window, no per-row Python."""
    counts = {
        r[0]: r[1] for r in df.groupBy(source_col).count().collect()
    }
    rates = mixture_rates(counts, target_shares, budget_rows)
    h = _bucket_hex(F.col(key_col), seed)
    keep = None
    for s, rate in sorted(rates.items()):
        cond = (F.col(source_col) == s) & (h < _threshold(rate))
        keep = cond if keep is None else keep | cond
    return df.filter(keep if keep is not None else F.lit(False))


def mixture_sql(
    table: str,
    key_expr: str,
    source_col: str,
    target_shares: dict[str, float],
    budget_rows: int,
    seed: str = "",
) -> str:
    """DuckDB-oracle mirror of ``mixture_sample``: recomputes the per-source
    rates from a counts CTE with the same double arithmetic and renders the
    same 8-hex-digit thresholds (printf), so row selection is identical."""
    total = sum(target_shares.values())
    case = " ".join(
        f"WHEN '{s}' THEN CAST({share / total!r} AS DOUBLE)"
        for s, share in sorted(target_shares.items())
    )
    h = f"substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 8)"
    return f"""
WITH cnt AS (
  SELECT {source_col} AS s, COUNT(*) AS c FROM {table}
  WHERE {source_col} IN ({", ".join(f"'{s}'" for s in sorted(target_shares))})
  GROUP BY 1
),
rates AS (
  SELECT s, printf('%08x', CAST(LEAST(CAST(FLOOR(
           LEAST(CASE s {case} END * {budget_rows} / CAST(c AS DOUBLE), 1.0)
           * 4294967296) AS BIGINT), 4294967295) AS BIGINT)) AS thr
  FROM cnt
)
SELECT d.* FROM {table} d JOIN rates r ON d.{source_col} = r.s
WHERE {h} < r.thr
"""


def mixture_sample_with_upsampling(
    df: DataFrame,
    key_col: str,
    source_col: str,
    target_shares: dict[str, float],
    budget_rows: int,
    seed: str = "",
) -> DataFrame:
    """Domain mixture where under-represented sources may be UPSAMPLED
    (rate > 1): each row emits ``floor(rate)`` guaranteed copies plus one
    more when its keyed hash falls under the fractional remainder — the
    "epochs per domain" construction (e.g. the Pile's per-set epochs).

    Output adds ``copy_idx`` (1-based) so duplicated rows stay distinct
    downstream.  Still map-only after the #sources-row count aggregate:
    replication is a per-row ``explode(sequence(...))`` with no shuffle,
    and the expected composition matches ``target_shares`` exactly in
    expectation.  Deterministic and repartition-stable like the capped
    variant."""
    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()}
    total = sum(target_shares.values())
    if total <= 0:
        raise ValueError("target shares must sum to a positive value")
    h = _bucket_hex(F.col(key_col), seed)
    copies = F.lit(0)
    for s, share in sorted(target_shares.items()):
        cnt = counts.get(s, 0)
        if cnt == 0:
            continue
        rate = share / total * budget_rows / cnt
        n_full = int(rate)
        frac = rate - n_full
        per_src = F.lit(n_full) + F.when(
            h < _threshold(frac), F.lit(1)
        ).otherwise(F.lit(0))
        copies = F.when(F.col(source_col) == s, per_src).otherwise(copies)
    return (
        df.withColumn("__n", copies)
        .withColumn(
            "copy_idx",
            F.explode(
                F.when(
                    F.col("__n") >= 1, F.sequence(F.lit(1), F.col("__n"))
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("__n")
    )


def temperature_shares(counts: dict[str, int], alpha: float) -> dict[str, float]:
    """Temperature-scaled domain shares: ``share_s ∝ count_s^alpha``.

    ``alpha=1`` reproduces the natural distribution, ``alpha<1`` flattens
    it (upweights rare domains), ``alpha=0`` is uniform — the standard
    multilingual/multi-corpus sampling recipe (exponentiated-smoothing
    weights, e.g. the mBERT/XLM-R sampling rule and GPT-3's corpus
    weighting).  Shares are normalized over SORTED keys so the double
    summation order is deterministic and mirrorable in SQL."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    w = {s: float(counts[s]) ** alpha for s in sorted(counts)}
    tot = sum(w.values())
    if tot <= 0:
        raise ValueError("counts must contain a positive total")
    return {s: v / tot for s, v in w.items()}


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float,
    budget_rows: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic ~``budget_rows`` sample whose domain composition is
    the temperature-``alpha`` flattening of the natural distribution.

    Same two-stage shape as ``mixture_sample`` (one #domains-row count
    aggregate, then a map-only keyed-hash filter): the only difference is
    that the target shares are DERIVED from the counts instead of given."""
    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()}
    rates = mixture_rates(counts, temperature_shares(counts, alpha), budget_rows)
    h = _bucket_hex(F.col(key_col), seed)
    keep = None
    for s, rate in sorted(rates.items()):
        cond = (F.col(source_col) == s) & (h < _threshold(rate))
        keep = cond if keep is None else keep | cond
    return df.filter(keep if keep is not None else F.lit(False))


def temperature_mixture_sql(
    table: str,
    key_expr: str,
    source_col: str,
    alpha: float,
    budget_rows: int,
    seed: str = "",
) -> str:
    """DuckDB mirror of ``temperature_mixture_sample``: recomputes counts,
    pow-``alpha`` weights, the normalizing sum (in sorted-key order via an
    ORDER-BY'd window frame, matching Python's sorted() summation), rates
    and 8-hex thresholds with the same double arithmetic."""
    h = f"substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 8)"
    return f"""
WITH cnt AS (
  SELECT {source_col} AS s, COUNT(*) AS c FROM {table} GROUP BY 1
),
w AS (SELECT s, c, pow(CAST(c AS DOUBLE), {alpha!r}) AS wgt FROM cnt),
tot AS (
  SELECT s, c, wgt,
         SUM(wgt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS tw
  FROM w
),
rates AS (
  SELECT s, printf('%08x', LEAST(CAST(FLOOR(
           LEAST(wgt / tw * {budget_rows} / CAST(c AS DOUBLE), 1.0)
           * 4294967296) AS BIGINT), 4294967295)) AS thr
  FROM tot
)
SELECT d.* FROM {table} d JOIN rates r ON d.{source_col} = r.s
WHERE {h} < r.thr
"""


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "",
    component_col: str = "component",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the split is keyed by the duplicate-cluster REPRESENTATIVE,
    so every member of a cluster lands in the same split (the standard
    eval-hygiene fix — a doc-keyed split puts a train doc's near-copy in
    test, quietly inflating eval scores).

    ``clusters``: (key_col, component) from ``graph.duplicate_clusters``
    — docs absent from it (singletons) split by their own key, which is
    exactly the component they'd carry as isolated nodes.

    Shape: one left join onto the cluster map + the same map-only keyed
    md5 threshold as ``split_assign``.  Deterministic, engine-portable,
    repartition-stable.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    j = df.join(
        clusters.select(key_col, component_col), key_col, "left"
    ).withColumn(
        "__split_key", F.coalesce(F.col(component_col), F.col(key_col))
    )
    return j.withColumn(
        "split", split_assign(F.col("__split_key"), weights, seed)
    ).drop("__split_key", component_col)
