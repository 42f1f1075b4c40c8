"""Corpus sink: partitioned, shard-size-bounded parquet writes.

The last stage of a curation pipeline writes training shards, and two
physical properties decide downstream throughput at 100 TB:

* partition layout — ``lang=…/source=…`` directories let every later job
  (per-language training mixes, per-source ablations) partition-prune
  instead of scanning the corpus;
* shard size — training data loaders want shards of bounded, similar
  row counts; Spark naturally emits one file per task, which skews with
  the input partitioning.

``write_corpus`` controls both declaratively: a repartition on the
partition columns (plus a salt derived from the stable id, so one huge
partition value still fans out across tasks instead of one giant file)
and ``maxRecordsPerFile`` as the hard per-shard bound.  No collect, no
driver-side file surgery — the same write plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    id_col: str = "doc_id",
    max_rows_per_file: int = 100_000,
    shards_per_partition: int = 8,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a partitioned corpus with bounded shard sizes.

    ``shards_per_partition`` spreads each partition value over that many
    write tasks (deterministic keyed salt — stable across reruns);
    ``max_rows_per_file`` caps rows per shard file regardless.
    ``format``: ``parquet`` (default) or ``orc`` — both columnar with
    min/max stats and partition pruning; ORC interops with Hive/Trino
    estates that standardize on it."""
    if format not in ("parquet", "orc"):
        raise ValueError(f"unsupported corpus format {format!r}")
    partition_by = partition_by or []
    salt = (F.crc32(F.col(id_col).cast("string")) % shards_per_partition).alias(
        "__shard"
    )
    out = df.repartition(*[F.col(c) for c in partition_by], salt) if partition_by \
        else df.repartition(salt)
    (
        out.write.option("maxRecordsPerFile", max_rows_per_file)
        .partitionBy(*partition_by)
        .mode(mode)
        .format(format)
        .save(path)
    )


def read_corpus(spark, path: str, format: str = "parquet", **filters) -> DataFrame:
    """Read a corpus written by ``write_corpus``; keyword filters become
    partition predicates the scan prunes on (``lang="en"``)."""
    df = spark.read.format(format).load(path)
    for col, val in filters.items():
        df = df.filter(F.col(col) == val)
    return df
