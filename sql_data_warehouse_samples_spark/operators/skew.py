"""Skew-mitigation join: key salting.

The reference *detects* distribution skew (vw_tables_with_skew.sql:19,
SkewDetection.sql:2-102) but cannot re-shard a bad key at query time; on
Spark the standard fix is salting: split each hot key's rows across S
sub-partitions by appending a salt to the shuffle key, and replicate the
small side S× so every sub-partition still finds its match.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py)
handles most cases automatically; explicit salting remains the lever when
one side must ALSO aggregate by the hot key, or under static planning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join robust to a skewed key distribution on ``big``.

    * ``big`` rows get a deterministic salt in [0, salt_buckets) derived from
      the whole row's hash (``salt_source`` overrides, e.g. a unique id col),
      so a hot key's rows spread over ``salt_buckets`` shuffle partitions.
    * ``small`` is exploded ×salt_buckets (acceptable: it's the small side),
      so every (key, salt) bucket finds its match.

    Result columns = big's columns + small's non-key columns, like a plain
    ``big.join(small, on, how)``.
    """
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("__salt", F.pmod(salt_source, F.lit(salt_buckets)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
