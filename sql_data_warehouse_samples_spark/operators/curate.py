"""Curation-funnel composition: many filters, ONE scan, per-stage accounting.

A production training-data pipeline chains filters (length → language →
quality → repetition → dedup → decontamination) and must report how many
documents each stage removed — the funnel numbers every curation paper
tabulates (e.g. Gopher's pipeline table, Rae et al. 2021).

The naive composition runs one count() job per stage — k full scans of a
100 TB corpus.  Here every stage is a Column predicate evaluated in a
single fused pass; the funnel is ONE aggregate producing per-stage pass
counts and cumulative survivors, and the final dataset is the same scan
filtered by the conjunction.  Non-map-only signals (e.g. the exact-dup
keeper flag, which needs a hash-group min) are precomputed as columns by
the caller and referenced as plain predicates, so their shuffles are paid
once and shared.

100 TB shape: funnel = one scan + one ~k-row reduce; apply = one scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Stage:
    """One curation filter: ``keep`` is True for surviving documents."""

    name: str
    keep: Column


def _flag(stage: Stage) -> Column:
    # NULL predicate (e.g. ratio over empty text) = fail, both engines
    return F.coalesce(stage.keep.cast("int"), F.lit(0))


def annotate(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """Add one ``<name>_pass`` int column per stage + ``keep_all``."""
    out = df
    keep_all = F.lit(1)
    for st in stages:
        f = _flag(st)
        out = out.withColumn(f"{st.name}_pass", f)
        keep_all = keep_all * f
    return out.withColumn("keep_all", keep_all)


def funnel(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """(stage_idx, stage, n_pass, n_cum) per stage in ONE aggregate.

    ``n_pass`` counts documents passing the stage in isolation; ``n_cum``
    counts survivors of stages 1..k — the funnel curve."""
    aggs = []
    cum = F.lit(1)
    for i, st in enumerate(stages, 1):
        f = _flag(st)
        cum = cum * f
        # COALESCE: an empty corpus funnels to zeros, not NULLs
        aggs.append(F.coalesce(F.sum(f), F.lit(0)).alias(f"p{i}"))
        aggs.append(F.coalesce(F.sum(cum), F.lit(0)).alias(f"c{i}"))
    row = df.agg(*aggs)
    stack_args = []
    for i, st in enumerate(stages, 1):
        stack_args += [str(i), f"'{st.name}'", f"p{i}", f"c{i}"]
    return row.selectExpr(
        f"stack({len(stages)}, {', '.join(stack_args)})"
        " AS (stage_idx, stage, n_pass, n_cum)"
    )


def apply(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """The curated output: documents passing EVERY stage (one scan)."""
    keep = F.lit(True)
    for st in stages:
        keep = keep & st.keep.isNotNull() & st.keep
    return df.filter(keep)


def calibrate_threshold(
    df: DataFrame,
    score_col: str,
    keep_rate: float,
    *,
    higher_is_better: bool = True,
    accuracy: int = 10_000,
) -> float:
    """Derive the filter threshold that keeps ~``keep_rate`` of documents:
    the (1 − keep_rate) quantile of the score distribution (or keep_rate
    quantile when lower scores are better).

    The calibration loop every curation pipeline runs ("keep the top 60%
    by quality"): ONE percentile_approx aggregate — partial sketches per
    partition, a driver-sized merge — instead of a global sort.  Feed the
    result to a ``Stage`` predicate."""
    if not 0.0 < keep_rate <= 1.0:
        raise ValueError(f"keep_rate must be in (0, 1], got {keep_rate}")
    q = (1.0 - keep_rate) if higher_is_better else keep_rate
    return df.select(
        F.percentile_approx(score_col, q, accuracy).alias("t")
    ).first()["t"]


def select_within_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    key_col: str,
    seed: str = "",
    bucket_dp: int = 3,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Greedy best-first subset under a weight budget: keep the
    highest-``score_col`` rows whose cumulative ``weight_col`` stays
    ≤ ``budget`` ("fill a 10B-token budget with the best documents").

    Semantics are the PREFIX of the global order
    ``(round(score, bucket_dp) DESC, md5(seed||key) ASC, key ASC)`` whose
    running weight (inclusive) stays within budget — deterministic,
    engine-portable, and exactly mirrorable by one SQL cumulative window.

    Scale shape — the obvious single cumulative window is a one-partition
    sort of the corpus; instead:

    1. bucket scores at ``bucket_dp`` decimals → weight histogram, ONE
       tiny aggregate (≤ 10^bucket_dp · score-range buckets) collected
       driver-side;
    2. buckets strictly above the cutoff are selected by a map-only
       filter — no ordering cost at all;
    3. ONLY the single boundary bucket (≈ 1/#buckets of the corpus) pays
       a rank-and-running-sum window, keyed by the uniform hash.

    A pathological distribution (all mass in one bucket) degrades to the
    windowed form on that bucket; raise ``bucket_dp`` to split it.

    Rows with a NULL score or NULL weight are EXCLUDED up front (a null
    score has no rank and a null weight has no budget cost — silently
    propagating either would corrupt the cutoff arithmetic).  The
    driver-side histogram is guarded by ``max_buckets``: if the bucketed
    score range produces more rows than that, the collect would stop
    being a "tiny aggregate", so the call fails loudly with guidance
    (lower ``bucket_dp``) instead of quietly materializing it.
    """
    from pyspark import StorageLevel

    from .dedup import _HOT_CACHES, release_hot_caches

    release_hot_caches()  # top-level entry: drop the previous op's caches
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    s = (
        df.filter(F.col(score_col).isNotNull() & F.col(weight_col).isNotNull())
        .withColumn("__b", F.round(F.col(score_col), bucket_dp))
        .withColumn("__h", h)
        # THREE consumers scan this frame (the histogram aggregate, the
        # above-cutoff filter, the boundary-bucket window); without the
        # cache each one recomputes the caller's score/weight projection
        # — for t15 that is the regex-heavy quality score, paid 3x over
        # the corpus (r12 job-trace).  Skinny rows (key, score, weight,
        # bucket, hash), MEMORY_AND_DISK like the dedup hot caches,
        # released by the next top-level operator.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _HOT_CACHES.append(s)
    # single pass: collect at most max_buckets+1 rows — the sentinel row
    # proves the ceiling was crossed without materializing the overage
    hist = (
        s.groupBy("__b")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__w"))
        .limit(max_buckets + 1)
        .collect()
    )
    if len(hist) > max_buckets:
        raise ValueError(
            f"select_within_budget: score histogram exceeds {max_buckets} "
            f"buckets at bucket_dp={bucket_dp} — the driver-side cutoff "
            "scan is only safe for a small histogram; lower bucket_dp "
            "(coarser buckets) or raise max_buckets deliberately"
        )
    # integer weights (token counts) keep every sum exact — the cutoff is
    # bit-identical to the SQL cumulative-window mirror, no float drift
    remaining = int(budget)
    full, boundary = [], None
    for r in sorted(hist, key=lambda r: -r["__b"]):
        if r["__w"] <= remaining:
            full.append(r["__b"])
            remaining -= r["__w"]
        else:
            boundary = r["__b"]
            break
    picked = s.filter(F.col("__b").isin(full)) if full else s.limit(0)
    if boundary is not None and remaining > 0:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(F.lit(1))
            .orderBy(F.asc("__h"), F.asc(key_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        edge = (
            s.filter(F.col("__b") == boundary)
            .withColumn("__cum", F.sum(F.col(weight_col).cast("long")).over(w))
            .filter(F.col("__cum") <= remaining)
            .drop("__cum")
        )
        picked = picked.unionByName(edge)
    return picked.drop("__b", "__h")
