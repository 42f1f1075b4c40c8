"""Slowly-changing-dimension Type 2 merge (versioned dimension history).

The reference's loading guidance centers on CTAS upserts into dimension
tables (data-load README CTAS patterns; SURVEY §2.9 D3/D16).  A Kimball
SCD2 dimension is the standard production form of that upsert: instead of
overwriting attributes in place, each business key carries a *version
history* — rows with ``valid_from`` / ``valid_to`` timestamps and a
current flag — so facts can join to the attribute values that were true
at transaction time.

``scd2_apply`` is the pure relational core: one null-safe full comparison
join between the dimension's CURRENT rows and the incoming snapshot on the
business key, classifying every key into unchanged / changed / new /
disappeared, then a union of the row classes.  History rows never enter
the join.

Scale shape (100 TB): the join is a single key-keyed shuffle of
|current| + |source| rows — history (the unbounded part of an SCD2 table)
is partition-pruned out by the ``is_current`` filter before any exchange.
``scd2_merge`` writes through the managed-table layer: with the dimension
Hive-partitioned on the current flag (the recommended layout), closed
versions are APPENDED to the history partition and only the current
partition is rewritten via dynamic partition overwrite — per-run write
cost is O(|current| + |changes|), never O(|history|).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _changed_predicate(tracked: list[str]) -> Column:
    """NULL-safe 'any tracked attribute differs' between src.* and cur.*."""
    terms = [
        ~F.col(f"src.{c}").eqNullSafe(F.col(f"cur.{c}")) for c in tracked
    ]
    return reduce(lambda a, b: a | b, terms)


def scd2_apply(
    dim: DataFrame,
    source: DataFrame,
    key: str | list[str],
    tracked: list[str] | None = None,
    *,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    close_missing: bool = False,
) -> DataFrame:
    """Return the new full state of an SCD2 dimension after applying a
    snapshot.

    ``dim`` holds the current + historical versions (with ``valid_from``,
    ``valid_to`` (NULL = open) and ``current_flag`` columns); ``source`` is
    the latest business snapshot (business key + attributes, no SCD
    columns).  ``tracked`` defaults to every non-key attribute column.
    ``as_of`` is the effective timestamp literal (``'2024-05-01 00:00:00'``)
    used both to close superseded versions and to open new ones.

    Row classes produced:

    * history (``current_flag`` false): passed through untouched.
    * unchanged current: passed through untouched.
    * changed current: closed — ``valid_to`` = ``as_of``, flag false — and a
      new open version inserted from the source row.
    * new key: inserted as an open version.
    * key absent from the snapshot: closed if ``close_missing`` (full
      snapshot feeds) else kept open (incremental feeds).
    """
    keys = [key] if isinstance(key, str) else list(key)
    scd_cols = (valid_from, valid_to, current_flag)
    for c in scd_cols:
        if c not in dim.columns:
            raise ValueError(f"dimension is missing SCD column {c!r}")
        if c in source.columns:
            raise ValueError(f"source must not carry SCD column {c!r}")
    attr_cols = [c for c in dim.columns if c not in keys and c not in scd_cols]
    missing = [c for c in keys + attr_cols if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing columns: {missing}")
    tracked = tracked or attr_cols
    ts = F.to_timestamp(F.lit(as_of))

    def open_version(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(valid_from, ts)
            .withColumn(valid_to, F.lit(None).cast(dim.schema[valid_to].dataType))
            .withColumn(current_flag, F.lit(True))
            .select(*dim.columns)
        )

    def close_version(df: DataFrame) -> DataFrame:
        return df.withColumn(valid_to, ts).withColumn(
            current_flag, F.lit(False)
        ).select(*dim.columns)

    history = dim.filter(~F.col(current_flag))
    current = dim.filter(F.col(current_flag))
    src = source.select(*keys, *attr_cols)

    changed_keys = (
        current.alias("cur")
        .join(src.alias("src"), keys, "inner")
        .filter(_changed_predicate(tracked))
        .select(*[F.col(f"cur.{k}") for k in keys])
    )
    closed = close_version(current.join(changed_keys, keys, "left_semi"))
    reopened = open_version(src.join(changed_keys, keys, "left_semi"))
    unchanged = current.join(changed_keys, keys, "left_anti")
    inserts = open_version(src.join(current, keys, "left_anti"))
    if close_missing:
        gone = current.join(src, keys, "left_anti")
        unchanged = unchanged.join(gone.select(*keys), keys, "left_anti")
        closed = closed.unionByName(close_version(gone))

    return reduce(
        DataFrame.unionByName, [history, unchanged, closed, reopened, inserts]
    )


def scd2_merge(
    catalog,
    table: str,
    source: DataFrame,
    key: str | list[str],
    tracked: list[str] | None = None,
    *,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    close_missing: bool = False,
) -> None:
    """Apply an SCD2 snapshot merge to a managed dimension table.

    With the table partitioned on ``current_flag`` (pass
    ``TableLayout(partition_column="is_current")`` at CTAS time), the write
    path is incremental: newly-closed versions are appended into the
    history partition and ONLY the current partition is replaced (dynamic
    partition overwrite) — the history partition's existing files are never
    rewritten.  Any other layout falls back to a full copy-on-write
    rewrite, correct but O(|table|) per run.
    """
    dim = catalog.table(table)
    layout = catalog.get_layout(table)
    new_state = scd2_apply(
        dim,
        source,
        key,
        tracked,
        as_of=as_of,
        valid_from=valid_from,
        valid_to=valid_to,
        current_flag=current_flag,
        close_missing=close_missing,
    )
    spark = catalog.spark
    if layout.partition_column == current_flag and not layout.buckets:
        # incremental path: history files untouched, closed rows appended,
        # current partition swapped.  Checkpoint breaks lineage on the table
        # being overwritten (copy-on-write safety).
        new_closed = new_state.filter(
            ~F.col(current_flag)
            & F.col(valid_to).eqNullSafe(F.to_timestamp(F.lit(as_of)))
        )
        new_current = new_state.filter(F.col(current_flag))
        new_closed = catalog._apply_write_layout(new_closed, layout).localCheckpoint(
            eager=True
        )
        new_current = catalog._apply_write_layout(new_current, layout).localCheckpoint(
            eager=True
        )
        qt = catalog._q(table)
        new_closed.write.insertInto(qt, overwrite=False)
        mode_conf = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(mode_conf, "static")
        try:
            spark.conf.set(mode_conf, "dynamic")
            new_current.write.insertInto(qt, overwrite=True)
        finally:
            spark.conf.set(mode_conf, prev)
        return
    merged = catalog._apply_write_layout(new_state, layout).localCheckpoint(eager=True)
    merged.write.insertInto(catalog._q(table), overwrite=True)
