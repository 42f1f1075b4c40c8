"""Evaluation metrics for quality filters / classifiers over corpora.

A training-data pipeline tunes its gates (t02 heuristics, t11 model
scores, t12 perplexity) against labeled samples; the standard scalar for
"does this score rank good docs above bad ones" is ROC-AUC.  Computed
exactly via the Mann-Whitney U rank-sum identity — no curve
materialization, no pairwise comparison:

    AUC = (Σ_{positives} avg_rank − n_pos·(n_pos+1)/2) / (n_pos·n_neg)

with tie groups sharing their AVERAGE rank (the textbook tie correction:
a positive and negative with equal score contribute 0.5).

Scale shape: one groupBy(score) aggregate (map-side combine) reduces the
corpus to its DISTINCT-SCORE table; the cumulative window then runs over
that table, not the corpus.  Heuristic/quantized scores have bounded
cardinality (token counts, 6-dp rounded ratios), so the single-partition
ordered window is distinct-score-sized — for a truly continuous score,
round/bucket first (the cost knob is explicit, not hidden).  All rank
math is exact integer/decimal arithmetic, so a SQL oracle reproduces the
AUC bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_distribution_drift(
    docs: DataFrame,
    side_col: str,
    text_col: str = "text",
    alpha: float = 0.5,
    round_terms: int = 12,
) -> DataFrame:
    """Distribution drift between two corpus snapshots: symmetric KL and
    total-variation distance over their token distributions — the drift
    monitor a recurring ingest runs between yesterday's corpus and
    today's (retrain tokenizers / re-fit quality models when it moves).

    ``side_col`` must take exactly two values; rows are compared as
    side A = the smaller value, side B = the larger.  Add-α smoothing
    over the UNION vocabulary keeps unseen tokens finite:
    p_i = (c_i + α) / (N + α·V).

    Float discipline (cross-engine exact): each token's KL/TV term is
    computed in IEEE double (division + ln are deterministic), ROUNDed to
    ``round_terms`` dp, and summed as DECIMAL — decimal addition is
    associative, so the total is order-independent and a SQL oracle
    reproduces it bit-for-bit (the t12 convention).

    Scale shape: ONE token-keyed aggregate with map-side combine (the
    two sides pivot inside the same groupBy — no join at all), then a
    single tiny reduce.  The shuffle key is the token hash: uniform,
    skew-free; vocab-sized intermediate, corpus-sized only at the scan.

    Returns ONE row: (n_tokens_a, n_tokens_b, vocab_union,
    kl_ab, kl_ba, tvd).
    """
    from .text import tokens

    # ONE map-side-combined reduce validates the side domain (min/max/
    # distinct-count/null-count) — the previous distinct().collect() paid
    # an exchange plus its AQE stage jobs for the same answer (r12,
    # guide §5: control-plane work in one aggregate)
    dom = docs.agg(
        F.min(side_col).alias("lo"),
        F.max(side_col).alias("hi"),
        F.countDistinct(side_col).alias("nd"),
        F.sum(F.col(side_col).isNull().cast("int")).alias("nn"),
    ).collect()[0]
    if dom.nd != 2 or (dom.nn or 0) > 0:
        # NULL must be rejected, not treated as a side: the pivot below
        # compares with `==`, which evaluates to NULL for a NULL side, so
        # every NULL-side count would silently land as 0 — garbage drift,
        # not an error
        sides = ([None] if (dom.nn or 0) else []) + (
            [dom.lo, dom.hi][: dom.nd]
        )
        # the one-aggregate domain check only sees min/max, so for
        # nd > 2 report the count alongside the two endpoints instead
        # of under-reporting the offending domain (r12 ADVICE)
        detail = (
            f"{dom.nd} distinct values including {sides}"
            if dom.nd > 2
            else f"{sides}"
        )
        raise ValueError(
            f"side_col must have exactly 2 non-NULL values, got {detail}"
        )
    a, b = dom.lo, dom.hi
    tok = docs.select(
        F.col(side_col).alias("__side"), F.explode(tokens(text_col)).alias("__t")
    )
    counts = tok.groupBy("__t").agg(
        F.sum(F.when(F.col("__side") == a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__side") == b, 1).otherwise(0)).alias("cb"),
    ).localCheckpoint(eager=True)  # vocab-sized; totals + terms both read
    # it — without this the corpus-sized explode+aggregate runs twice
    totals = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    na, nb, v = int(totals.na), int(totals.nb), int(totals.v)
    p = (F.col("ca") + alpha) / F.lit(float(na + alpha * v))
    q = (F.col("cb") + alpha) / F.lit(float(nb + alpha * v))
    dec = f"decimal(38,{round_terms})"
    terms = counts.select(
        F.round(p * F.log(p / q), round_terms).cast(dec).alias("__kl_ab"),
        F.round(q * F.log(q / p), round_terms).cast(dec).alias("__kl_ba"),
        F.round(F.abs(p - q), round_terms).cast(dec).alias("__tv"),
    )
    return terms.agg(
        F.lit(na).cast("long").alias("n_tokens_a"),
        F.lit(nb).cast("long").alias("n_tokens_b"),
        F.lit(v).cast("long").alias("vocab_union"),
        F.round(F.sum("__kl_ab").cast("double"), 6).alias("kl_ab"),
        F.round(F.sum("__kl_ba").cast("double"), 6).alias("kl_ba"),
        F.round((F.sum("__tv").cast("double") / 2), 6).alias("tvd"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_distinct_scores: int | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against boolean/0-1 ``label_col``.

    Returns ONE row: (auc double 6 dp, n_pos, n_neg, n_distinct_scores).
    Rows with a NULL score or label are excluded (no rank semantics for
    them).  AUC is NULL when either class is empty.

    ``max_distinct_scores`` is the continuous-score cost guard: the
    single-partition ordered window runs over the DISTINCT-SCORE table,
    which is only safe when score cardinality is bounded (heuristic /
    quantized scores).  When set and the observed distinct count exceeds
    it, scores are first bucketed into that many equal-width bins
    (bucket-midpoint as the score) — the window is then provably bounded,
    and the AUC becomes the bucketed approximation (ties within a bin
    count as 0.5, the standard binned-AUC semantics).  Default ``None``
    preserves the exact behavior unchanged.
    """
    from pyspark.sql import Window

    scored = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    if max_distinct_scores is not None:
        if max_distinct_scores < 1:
            raise ValueError("max_distinct_scores must be >= 1")
        dd = F.col("__s").cast("double")
        # min/max over FINITE scores only: a single NaN (0/0 upstream) or
        # +/-inf (1/0) would otherwise make width NaN/inf and collapse
        # EVERY score into one bucket — AUC silently 0.5.  Non-finite
        # rows pass through unbucketed (NaN buckets above +inf via
        # Spark's NaN-is-largest ordering, matching the exact path).
        nonfinite = F.isnan(dd) | (dd == float("inf")) | (dd == float("-inf"))
        finite = F.when(~nonfinite, dd)
        stats = scored.agg(
            F.countDistinct("__s").alias("nd"),
            F.min(finite).alias("mn"),
            F.max(finite).alias("mx"),
        ).collect()[0]
        if (
            stats.nd is not None
            and stats.nd > max_distinct_scores
            and stats.mn is not None
            and float(stats.mx) > float(stats.mn)
        ):
            mn, mx = float(stats.mn), float(stats.mx)
            width = (mx - mn) / max_distinct_scores
            bucket = F.least(
                F.floor((dd - mn) / width),
                F.lit(max_distinct_scores - 1),
            )
            scored = scored.withColumn(
                "__s",
                F.when(nonfinite, dd).otherwise(
                    mn + (bucket + 0.5) * width
                ),
            )
    groups = scored.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__y").alias("__pos"),
    )
    # cumulative count of strictly-smaller scores; the window frame is the
    # DISTINCT-SCORE table (see module docstring), not the corpus
    w = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = groups.withColumn(
        "__c_lt", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    ).withColumn(
        # average rank of the tie group, exact in DECIMAL halves
        "__avg_rank",
        F.col("__c_lt").cast("decimal(28,1)")
        + (F.col("__cnt").cast("decimal(28,1)") + 1) / 2,
    )
    return ranked.agg(
        F.sum("__pos").alias("__n_pos"),
        (F.sum("__cnt") - F.sum("__pos")).alias("__n_neg"),
        F.sum(F.col("__pos").cast("decimal(28,1)") * F.col("__avg_rank")).alias(
            "__rank_sum"
        ),
        F.count(F.lit(1)).alias("n_distinct_scores"),
    ).select(
        F.round(
            (
                F.col("__rank_sum")
                - F.col("__n_pos").cast("decimal(28,1)")
                * (F.col("__n_pos").cast("decimal(28,1)") + 1)
                / 2
            ).cast("double")
            / F.nullif(
                (F.col("__n_pos") * F.col("__n_neg")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("auc"),
        F.col("__n_pos").alias("n_pos"),
        F.col("__n_neg").alias("n_neg"),
        "n_distinct_scores",
    )
