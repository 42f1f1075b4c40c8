"""Interval (range-containment) join: points ⋈ containing intervals.

Joins every point row to every interval row with ``start <= point_ts <
end`` (half-open, optionally also on equi-keys).  The naive Spark plan for
this predicate is a BroadcastNestedLoopJoin / cartesian product — O(|P|·|I|)
comparisons, the classic range-join scale killer.

Spark-first shape: coarse time-bucketing turns the range predicate into an
equi-join.  Each interval is exploded onto every bucket it covers, each
point is tagged with its single containing bucket, and the join runs as a
plain hash equi-join on (keys…, bucket) with the exact range check left as
a residual filter.  A (point, interval) pair can only meet in the point's
own bucket, so no duplicate elimination is needed.

Cost at 100 TB: shuffle = |P| + Σ_i ceil(len_i / bucket) rows, hash-keyed
(skew-free for time-spread data); pick ``bucket_seconds`` near the median
interval length so the explosion factor stays ~2×.  Oracle-checked against
DuckDB's native inequality join (workload q59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(df: DataFrame, col: str):
    """Microseconds-since-epoch for TIMESTAMP and TIMESTAMP_NTZ alike
    (unix_micros rejects NTZ; timestampdiff takes both)."""
    dt = dict(df.dtypes)[col]
    return F.expr(
        f"timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS {dt}), {col})"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner-join points to the intervals containing them.

    Output: all point columns + all interval columns (names must be
    disjoint apart from the optional equi-keys).  Empty or inverted
    intervals (``end <= start``) match nothing.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    w = int(bucket_seconds) * 1_000_000

    pt = points.withColumn("__b", F.floor(_epoch_us(points, point_ts) / w))
    s_us = _epoch_us(intervals, start_ts)
    e_us = _epoch_us(intervals, end_ts)
    iv = (
        intervals.filter(F.col(end_ts) > F.col(start_ts))
        .withColumn(
            "__b",
            F.explode(
                F.sequence(F.floor(s_us / w), F.floor((e_us - 1) / w))
            ),
        )
    )
    cond = [pt["__b"] == iv["__b"]]
    for k in keys:
        cond.append(pt[k] == iv[k])
    residual = (iv[start_ts] <= pt[point_ts]) & (pt[point_ts] < iv[end_ts])
    c = cond[0]
    for extra in cond[1:]:
        c = c & extra
    joined = pt.join(iv, c & residual, "inner")
    out_cols = [pt[cc] for cc in points.columns] + [
        iv[cc] for cc in intervals.columns if cc not in keys
    ]
    return joined.select(*out_cols)
