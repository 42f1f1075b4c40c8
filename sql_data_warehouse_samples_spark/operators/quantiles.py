"""Scale-safe NTILE: two-pass quantile bucketing.

T-SQL ``NTILE(n) OVER (ORDER BY x)`` (white-papers ranking-function
inventory; exercised by workload q30) demands a TOTAL order — Spark plans
it as a single-partition WindowExec, which serializes the whole input
through one task.  Fine for day-grain pre-aggregates; a scale-killer when
the window input grows with the corpus (q30 windows over *customers*).

The two-pass shape keeps every stage distributed:

1. boundary pass — ``percentile_approx(x, [1/n … (n-1)/n])``: partial
   aggregation per partition (map-side combine), one tiny final reduce;
   the result is n-1 driver-sized scalars, independent of corpus size.
2. assignment pass — a map-only CASE over the boundary literals (the
   degenerate broadcast range join: n-1 range predicates against a
   constant table small enough to inline).  No shuffle, no window.

Cost at 100 TB: one scan + a ~KB reduce for pass 1, one scan for pass 2 —
versus a single task sorting 100 TB for exact NTILE.  The trade: ties
land in one bucket (exact NTILE row-numbers them apart) and boundaries
carry percentile_approx error, so bucket populations are equal only to
within the sketch accuracy.  tests/test_operators.py asserts ≥99%
per-row agreement with exact NTILE on sf0.01.

Measured crossover (scripts/scale_probe.py ntile, local[32]): exact wins
below ~5M rows (single-task sort is cheap, approx pays two scans);
at 15.4M rows exact takes 10.9 s vs approx 3.8 s and the exact curve is
superlinear (0.5 → 1.9 → 10.9 s for 1M → 4M → 15M) while approx tracks
scan cost — at cluster scale the exact path is not an option.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_ntile(
    df: DataFrame,
    col: str,
    n: int,
    *,
    descending: bool = False,
    accuracy: int = 10_000,
    out: str = "bucket",
) -> DataFrame:
    """Add 1-based bucket column ``out``: the distributed NTILE(n).

    ``descending=True`` matches ``NTILE(n) OVER (ORDER BY col DESC)`` —
    bucket 1 holds the largest values.  ``accuracy`` is the
    percentile_approx sketch parameter (exact when the number of distinct
    values is below it).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        return df.withColumn(out, F.lit(1))
    probs = [i / n for i in range(1, n)]
    bounds = df.select(
        F.percentile_approx(col, probs, accuracy).alias("b")
    ).first()["b"]
    return df.withColumn(out, _bucket_expr(F.col(col), bounds, descending))


def _bucket_expr(c: Column, bounds: list, descending: bool) -> Column:
    """CASE chain over ascending quantile boundaries ``bounds``."""
    n = len(bounds) + 1
    if descending:
        # bucket 1 = values above the (n-1)/n quantile
        expr = F.when(c > F.lit(bounds[-1]), F.lit(1))
        for k in range(2, n):
            expr = expr.when(c > F.lit(bounds[n - 1 - k]), F.lit(k))
    else:
        expr = F.when(c <= F.lit(bounds[0]), F.lit(1))
        for k in range(2, n):
            expr = expr.when(c <= F.lit(bounds[k - 1]), F.lit(k))
    return expr.otherwise(F.lit(n))
