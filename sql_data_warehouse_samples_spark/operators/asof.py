"""As-of (temporal point-in-time) join.

Matches each left row to the single most recent right row at-or-before the
left row's timestamp (``direction="backward"``, the attribution /
last-known-value join) or the earliest right row at-or-after it
(``direction="forward"``), per key.  Left rows with no match keep NULL right
columns (left-outer semantics) — the same contract as DuckDB's
``ASOF LEFT JOIN`` and kdb's ``aj``.

The reference engine family expresses this as a correlated ``TOP 1 ...
ORDER BY ts DESC`` subquery per row (see the latest-run pattern in
samples/sqlops/MonitoringScripts/LatestBackup.sql:2-10); at warehouse scale
that per-row nested loop is untenable.

Spark-first shape: NOT a join at all.  Both inputs are union-tagged into one
frame and a single per-key ordered window carries the latest right-side
payload forward onto left rows (``last(payload, ignorenulls=True)`` over an
unbounded-preceding frame).  Cost at 100 TB: exactly ONE hash exchange of
|L|+|R| rows on the key plus a linear in-partition sort-scan — no row
amplification, no range explode, versus the naive join+ROW_NUMBER plan whose
shuffle carries every (left, right-candidate) match pair.  Keys are user/
entity grain, so per-partition state is one entity's history — bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on key ``on`` and time columns.

    Output: every left row (left-outer), with all right columns (NULL when
    no right row qualifies).  Column names must be disjoint apart from the
    key.  At equal timestamps the right row IS eligible (``<=`` / ``>=``
    semantics); among equal right timestamps the highest-sorting payload
    wins, so callers wanting determinism there should ensure ``(on,
    right_ts)`` is unique — the same caveat DuckDB's ASOF JOIN carries.

    ``tolerance``: optional SQL interval string (e.g. ``"7 days"``); matches
    further than the tolerance from the left timestamp are nulled out, the
    pandas ``merge_asof(tolerance=...)`` contract.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")

    payload_cols = [c for c in right.columns if c not in keys]
    left_cols = [c for c in left.columns if c not in keys]

    r_u = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
    )
    l_u = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
    )
    # align the union schema: each side lacks the other's struct column
    r_schema = r_u.schema["__r"].dataType
    l_schema = l_u.schema["__l"].dataType
    r_u = r_u.withColumn("__l", F.lit(None).cast(l_schema))
    l_u = l_u.withColumn("__r", F.lit(None).cast(r_schema))
    both = l_u.unionByName(r_u)

    # backward: scan time ascending, right rows sort before left rows at an
    # equal timestamp so ``<=`` matches carry onto the left row.  forward is
    # the mirrored scan (time descending) carrying the earliest ``>=`` row.
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *keys,
        "__ts",
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
        F.last(F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__mts"),
    ).filter(F.col("__is_left") == 1)

    if tolerance is not None:
        if direction == "backward":
            ok = F.col("__mts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            ok = F.col("__mts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        carried = carried.withColumn(
            "__m", F.when(ok, F.col("__m")).otherwise(F.lit(None).cast(r_schema))
        )

    out = carried.select(
        *keys,
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )
    return out
