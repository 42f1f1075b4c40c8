"""Shared helpers for workload queries (cross-engine determinism)."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects unless the legacy nanosAsLong conf is on.  It is a
        # runtime SQL conf, so set it here rather than relying on a session
        # factory — callers (the external driver included) may hand us a
        # vanilla SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts read as long ns (nanosAsLong); truncate to µs exactly the way
        # DuckDB casts TIMESTAMP_NS → TIMESTAMP, so oracles agree.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def dec(c: str | Column, scale: int = 4) -> Column:
    """Exact-decimal view of a double column (order-independent aggregation)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def dsum(c: str | Column, alias: str, scale: int = 4) -> Column:
    """SUM over double made order-independent via decimal, emitted as double."""
    return F.sum(dec(c, scale)).cast("double").alias(alias)


def davg(c: str | Column, alias: str, scale: int = 4) -> Column:
    """AVG as exact-decimal sum divided by count, both engines identically."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col, scale)).cast("double") / F.count(col)).alias(alias)


def serving_cache_dir(sf_dir: str, kind: str, table: str) -> str:
    """Scratch directory for a serving index built over one dataset —
    keyed by the dataset's CONTENT, not just its path: the key folds in
    a cheap fingerprint of the source table's parquet files (path
    relative to the table root + size + mtime), so regenerating the
    dataset at the same path gets a FRESH index instead of silently
    serving the stale one (r10 ADVICE), and two hosts' differing /tmp
    trees cannot collide on a predictable fixed name.  Entries are
    keyed by full RELATIVE PATH and the list is sorted as a whole (r11
    ADVICE: ``os.walk`` traversal order is arbitrary and basenames
    repeat across subdirectories, so a walk-order/basename key could
    hash identical data differently across runs or filesystems — a
    spurious-miss-only defect, but every miss strands a stale /tmp
    index dir)."""
    import hashlib

    src = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(src):
        for root, _dirs, files in os.walk(src):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                parts.append(
                    f"{os.path.relpath(p, src)}:{st.st_size}:{st.st_mtime_ns}"
                )
        parts.sort()
    elif os.path.exists(src):
        st = os.stat(src)
        parts.append(f"{table}:{st.st_size}:{st.st_mtime_ns}")
    key = hashlib.md5(
        ("v3:" + os.path.abspath(sf_dir) + "|" + ";".join(parts)).encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp", f"spark_graft_{kind}_{key}")


# SQL-side fragments mirroring the helpers above (for DuckDB oracles).
def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
