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


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against boolean/0-1 ``label_col``.

    Returns ONE row: (auc double 6 dp, n_pos, n_neg, n_distinct_scores).
    Rows with a NULL score or label are excluded (no rank semantics for
    them).  AUC is NULL when either class is empty.
    """
    from pyspark.sql import Window

    scored = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
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
