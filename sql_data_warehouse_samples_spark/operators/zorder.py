"""Z-order (Morton-curve) clustering key for multi-column data skipping.

The reference engine's clustered columnstore sorts segments on ONE key;
queries filtering on any other column scan every segment
(samples/sqlops Rowgroups/TableHealthCount monitoring exists precisely to
watch segment quality).  Parquet gives Spark the same min/max
segment-elimination machinery per row group — but a single-column sort only
tightens the stats of that column.  Z-ordering interleaves the bits of
several columns' rank codes into one sort key, so ONE sort clusters the
table in every participating dimension at once: each row group covers a
small tile of the multi-dimensional space and filters on ANY of the columns
skip most row groups (the standard warehouse/lakehouse layout trick, e.g.
Delta OPTIMIZE ZORDER BY).

Mechanics (all JVM-side, map-only after one driver-sized quantile sketch):

1. Per column, ``approxQuantile`` computes ``2^bits − 1`` boundaries —
   a driver-sized list (255 doubles at the default 8 bits), NEVER the data.
   Quantile (not min/max-uniform) coding keeps codes balanced under skew.
2. Each value folds over the boundary-array literal to its rank code in
   ``[0, 2^bits)``.
3. Codes interleave bit-by-bit into one BIGINT Morton key (single SQL
   expression, built as one string — no per-bit py4j traffic).

Scale: the sketch is one pass (all columns in a single ``approxQuantile``
call); coding+interleaving is a pure projection; the final
``repartitionByRange + sortWithinPartitions`` on the key is the same
exchange any clustered write already pays.  100 TB corpora z-order
per-partition (daily loads) with the same code.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def rank_code(col: str, boundaries: list[float]) -> Column:
    """Quantile rank of ``col`` in [0, len(boundaries)]: the number of
    boundaries at-or-below the value.  One fold over a literal array."""
    arr = ", ".join(f"{float(b)!r}D" for b in boundaries)
    return F.expr(
        f"aggregate(array({arr}), 0L, "
        f"(acc, b) -> acc + IF(CAST(`{col}` AS DOUBLE) >= b, 1L, 0L))"
    )


def interleave(codes: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave k rank codes (each < 2^bits) into one BIGINT:
    bit i of code j lands at position ``i*k + j``."""
    k = len(codes)
    if k < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * k > 62:
        raise ValueError(f"{bits} bits x {k} cols overflows a signed 64-bit key")
    terms = []
    for j, c in enumerate(codes):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    key_col: str = "__zorder",
    rel_err: float = 0.001,
    boundaries: dict[str, list[float]] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Annotate ``df`` with a Morton z-order key over numeric ``cols``.

    Boundaries default to an ``approxQuantile`` sketch — note the sketch's
    merge order depends on physical partitioning, so codes can shift by
    ±1 bucket between runs over differently-partitioned input.  The TILES
    are equally good either way (clustering quality does not need stable
    codes); pass explicit ``boundaries`` (e.g. from a saved stats run) or
    ``exact=True`` (one exact-``percentile`` aggregate — deterministic under
    any partitioning, but the exact sort-based aggregate is the small-table
    path; keep the sketch at corpus scale) when bit-reproducible keys
    matter.

    Write clustered by it for multi-column row-group skipping::

        z = with_zorder(df, ["custkey", "totalprice"])
        (z.repartitionByRange(n, "__zorder")
          .sortWithinPartitions("__zorder")
          .drop("__zorder")
          .write.parquet(path))
    """
    if boundaries is not None:
        all_bounds = [boundaries[c] for c in cols]
    else:
        n_bounds = (1 << bits) - 1
        probs = [(i + 1) / (1 << bits) for i in range(n_bounds)]
        casted = df.select(
            *df.columns,
            *[F.col(c).cast("double").alias(f"__zd_{c}") for c in cols],
        )
        if exact:
            parr = ", ".join(repr(p) + "D" for p in probs)
            row = casted.select(
                *[
                    F.expr(f"percentile(`__zd_{c}`, array({parr}))").alias(c)
                    for c in cols
                ]
            ).first()
            all_bounds = [row[c] or [] for c in cols]
        else:
            all_bounds = casted.approxQuantile(
                [f"__zd_{c}" for c in cols], probs, rel_err
            )
    if any(not b for b in all_bounds):
        # empty input (or empty sketch): no meaningful tiling — constant key
        return df.withColumn(key_col, F.lit(0).cast("long"))
    codes = [
        rank_code(c, bounds) for c, bounds in zip(cols, all_bounds)
    ]
    return df.withColumn(key_col, interleave(codes, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
    exact: bool = False,
) -> None:
    """Write ``df`` as parquet clustered on the z-order key of ``cols``:
    each output file (row group) covers one tile of the multi-column space,
    so min/max pruning works for filters on ANY of the columns.

    Files are assigned by the DYADIC TILE id (the top ``ceil(log2
    n_files)`` bits of the Morton key), not by raw range-sampling of the
    key: the range partitioner's sample-derived bounds can land mid-tile
    and leave a file straddling two tiles in one dimension (observed as
    ~0.60 vs the ~0.50 geometric coverage).  Partitioning by the coarse
    tile id first means a bound can only fall BETWEEN tiles — every file
    covers whole dyadic tiles, deterministically."""
    z = with_zorder(df, cols, bits, exact=exact)
    shift = max(bits * len(cols) - max(1, math.ceil(math.log2(n_files))), 0)
    z = z.withColumn("__ztile", F.shiftright(F.col("__zorder"), shift))
    (
        z.repartitionByRange(n_files, "__ztile")
        .sortWithinPartitions("__zorder")
        .drop("__zorder", "__ztile")
        .write.mode("overwrite")
        .parquet(path)
    )
