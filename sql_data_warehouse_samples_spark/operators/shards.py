"""Deterministic corpus shuffle + training-shard export.

Training runs need the corpus in a RANDOM but REPRODUCIBLE order, cut into
fixed-count shards that data-loader workers can claim independently.  The
naive recipe — ``ORDER BY rand()`` — is wrong twice at 100 TB: `rand()` is
per-partition-seeded (changes under repartitioning, irreproducible across
engines) and a global sort is an all-data range exchange whose only purpose
is randomness we can get for free from a hash.

Recipe here (the standard keyed-hash shuffle, same family as
``operators/sampling.py``):

* ``shuffle_hash(key, seed)`` — md5 of the seed-prefixed key.  Uniform,
  deterministic, identical hex in Spark and DuckDB, so shard membership
  and intra-shard order are exactly reproducible in the oracle.
* ``shard_assign`` — the first 12 hex digits (48 bits) as an integer,
  mod ``n_shards``: map-only, no coordination, shards are iid samples of
  the corpus (each ≈ |corpus|/n in expectation; no global count needed).
* ``write_training_shards`` — ONE exchange (hash-repartition on the shard
  id), files sorted by the shuffle hash, directory-partitioned by
  ``shard=<i>`` so a loader worker opens exactly its shard's files.
  A new ``seed`` re-shuffles the corpus for the next epoch without any
  logic change; the write is the same single exchange.

Changing ``n_shards`` reassigns rows (mod arithmetic), but membership for a
fixed (seed, n_shards) is stable under corpus growth ONLY for existing
keys — new docs land uniformly.  That is the property training wants:
shards stay balanced, assignment never depends on physical layout.

Reference anchor: the reference distributes on a hash column at CTAS time
(DISTRIBUTION = HASH, SURVEY §2.9 D2) for join co-location; this operator
is the training-export counterpart where the hash is seeded and the goal is
reproducible randomness rather than co-location.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 12 hex digits = 48 bits — fits a signed 64-bit integer in both engines
#: (DuckDB: ``CAST('0x' || SUBSTR(md5(x), 1, 12) AS BIGINT)``).
_PREFIX_HEX = 12


def shuffle_hash(key: Column | str, seed: str = "") -> Column:
    """Full md5 hex of the seed-prefixed key: the reproducible random
    order.  Lowercase-hex string comparison is identical across engines."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(seed), k.cast("string")))


def shard_assign(key: Column | str, n_shards: int, seed: str = "") -> Column:
    """Deterministic shard id in ``[0, n_shards)`` — map-only."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    prefix = F.substring(shuffle_hash(key, seed), 1, _PREFIX_HEX)
    return F.pmod(F.conv(prefix, 16, 10).cast("long"), F.lit(n_shards))


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "",
    shard_col: str = "shard_id",
    order_col: str = "__shuffle",
) -> DataFrame:
    """Annotate ``df`` with its shard id and intra-shard shuffle key.

    Pure projection — the exchange happens only at write time (or never,
    if the caller just needs the assignment).  The md5 is computed ONCE:
    the shard id derives from the order hash's prefix, bit-identical to
    calling ``shard_assign`` directly."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    out = df.withColumn(order_col, shuffle_hash(F.col(key_col), seed))
    return out.withColumn(
        shard_col,
        F.pmod(
            F.conv(F.substring(F.col(order_col), 1, _PREFIX_HEX), 16, 10).cast(
                "long"
            ),
            F.lit(n_shards),
        ),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "",
    fmt: str = "parquet",
) -> int:
    """Materialize shuffled training shards under ``path/shard_id=<i>/``.
    Returns the number of rows the write job actually processed (counted
    in-flight via ``Observation`` — zero extra passes).

    ONE range exchange on (shard id, shuffle hash); every file is
    internally sorted by the shuffle hash, so a loader streaming a shard's
    files in name order reads the reproducible shuffled order without any
    further sort.  Range (not hash) partitioning: hashing ``n`` distinct
    shard ids into ``n`` tasks collides ~1/e of them (empty tasks +
    2-3-shard stragglers — measured 28% slower end-to-end), while range
    boundaries give ~one shard per task; a boundary that splits a shard
    mid-hash just yields two files whose name order continues the hash
    order, so per-shard read order is unaffected."""
    from pyspark.sql import Observation

    z = shuffle_shards(df, key_col, n_shards, seed)
    obs = Observation()
    (
        # observe DOWNSTREAM of the range exchange: the range partitioner's
        # boundary-sampling pass re-evaluates the exchange's child, so an
        # upstream observation would double-count every row
        z.repartitionByRange(n_shards, "shard_id", "__shuffle")
        .sortWithinPartitions("shard_id", "__shuffle")
        .drop("__shuffle")
        .observe(obs, F.count(F.lit(1)).alias("n_rows"))
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    return int(obs.get["n_rows"])


#: Manifest sidecar directory (parquet), written next to the shard dirs.
MANIFEST_DIR = "_shard_manifest"


def shard_manifest(df: DataFrame, key_col: str, n_shards: int, seed: str = "") -> DataFrame:
    """Per-shard integrity summary computed FROM THE DATA: row count and an
    order-insensitive content checksum (sum of the 48-bit key-hash
    prefixes — commutative, so any physical layout yields the same value;
    a missing, duplicated or swapped row changes it).

    One #shards-row aggregate; reused both at write time (to persist the
    manifest) and at audit time (to recompute and compare)."""
    z = shuffle_shards(df, key_col, n_shards, seed)
    return z.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.conv(F.substring(F.col("__shuffle"), 1, _PREFIX_HEX), 16, 10).cast(
                "long"
            )
        ).alias("content_checksum"),
        F.min("__shuffle").alias("first_hash"),
        F.max("__shuffle").alias("last_hash"),
    )


def write_shard_manifest(
    df: DataFrame, path: str, key_col: str, n_shards: int, seed: str = ""
) -> None:
    """Persist the manifest beside the shards (one tiny parquet).

    Source-derived variant — recomputes assignment from ``df``, costing a
    second source pass.  Exports should use ``write_manifest_from_export``
    (one narrow OUTPUT scan) instead; this form remains for callers that
    want a manifest without (or before) a physical export."""
    (
        shard_manifest(df, key_col, n_shards, seed)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{MANIFEST_DIR}")
    )


def manifest_from_export(spark, path: str, key_col: str, seed: str = "") -> DataFrame:
    """Manifest computed FROM THE WRITTEN SHARDS — one narrow output scan
    (``shard_id`` + the key column only; parquet column pruning keeps the
    IO at key width, not payload width).  At 100 TB a source-derived
    manifest is a full extra corpus pass per export; this certifies the
    bytes that actually landed on disk — exactly what a later
    ``verify_shards`` audit re-reads and diffs against."""
    data = spark.read.parquet(path).select("shard_id", key_col)
    z = data.withColumn("__shuffle", shuffle_hash(F.col(key_col), seed))
    return z.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.conv(F.substring(F.col("__shuffle"), 1, _PREFIX_HEX), 16, 10).cast(
                "long"
            )
        ).alias("content_checksum"),
        F.min("__shuffle").alias("first_hash"),
        F.max("__shuffle").alias("last_hash"),
    )


def write_manifest_from_export(
    spark, path: str, key_col: str, seed: str = ""
) -> list:
    """Compute the manifest from the written export, persist it beside the
    shards, and return its (collected, #shards-sized) rows so the caller
    can cross-check totals without another scan."""
    man = manifest_from_export(spark, path, key_col, seed)
    rows = man.collect()
    spark.createDataFrame(rows, man.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{MANIFEST_DIR}")
    return rows


def verify_shards(
    spark, path: str, key_col: str, seed: str = ""
) -> DataFrame:
    """Audit a shard export against its manifest: recompute every shard's
    count/checksum from the files on disk and diff.

    Returns (shard_id, ok, n_rows, n_rows_expected, checksum, checksum
    _expected) — a missing file, truncated shard, duplicated row or
    cross-shard mixup flags exactly the shards it touched.  Cost: one
    scan of the export (key column only — column pruning keeps the audit
    IO at key width, not payload width) + the tiny manifest."""
    manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}").select(
        "shard_id",
        F.col("n_rows").alias("n_rows_expected"),
        F.col("content_checksum").alias("checksum_expected"),
    )
    data = spark.read.parquet(path).select("shard_id", key_col)
    h = shuffle_hash(F.col(key_col), seed)
    actual = (
        data.withColumn(
            "__p", F.conv(F.substring(h, 1, _PREFIX_HEX), 16, 10).cast("long")
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__p").alias("checksum"),
        )
    )
    joined = manifest.join(actual, "shard_id", "full_outer")
    ok = (
        F.col("n_rows").eqNullSafe(F.col("n_rows_expected"))
        & F.col("checksum").eqNullSafe(F.col("checksum_expected"))
    )
    return joined.select(
        "shard_id", ok.alias("ok"), "n_rows", "n_rows_expected",
        "checksum", "checksum_expected",
    )
