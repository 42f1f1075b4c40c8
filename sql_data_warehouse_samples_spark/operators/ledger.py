"""Persistent content-hash ledger for incremental corpus dedup.

``incremental_dedup`` (operators/dedup.py) anti-joins a new batch against
the corpus on the normalized-content md5.  Without a ledger the corpus
side must be re-hashed from raw text on EVERY ingest — reading 100 TB of
text per daily batch to produce 16-byte keys.  The ledger persists those
keys once, at ingest time, so the steady-state cost is::

    read ledger (16 B x corpus docs)  +  hash the new batch only

The ledger is a plain parquet directory of ``content_hash`` strings —
engine-portable, append-only, safe to compact with any parquet rewriter.
Appends happen strictly AFTER the batch's fresh set is computed (the
anti-join never sees its own batch), and each batch's hashes arrive as
new files, so a failed ingest can be retried by deleting the files it
wrote.  At 100 TB / ~1e11 docs the ledger is ~2-3 TB of hashes — one
narrow column, predicate-prunable, broadcastable per-shard when ingest
shards partition the hash space.

The streaming twin (streaming/ingest.py `dedup_gate`) takes the same
ledger as a static frame: a stream-static LEFT ANTI join drops documents
already in the corpus at stream start, while the watermark-horizon
``dropDuplicates`` handles within-stream repeats; the batch
reconciliation pass (`ingest`) stays the exactness backstop — the
standard lambda split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

LEDGER_SCHEMA = StructType([StructField("content_hash", StringType(), False)])


class ContentHashLedger:
    """Append-only parquet ledger of every content hash ever admitted."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def hashes(self) -> DataFrame:
        """The ledger as a one-column frame (empty if nothing ingested).
        Self-heals a compact() interrupted mid-swap first (dirswap)."""
        from .dirswap import recover

        recover(self.path)
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:  # path does not exist yet
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def ingest(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Admit a batch: dedup against the ledger + within the batch,
        append the survivors' hashes, return the surviving documents
        (with their ``content_hash`` column).

        The corpus side of the anti-join is the LEDGER — no document text
        outside the batch is ever read, so ingest cost scales with the
        batch, not the corpus.
        """
        from .dedup import incremental_dedup

        fresh = incremental_dedup(
            batch, corpus=None, text_col=text_col, id_col=id_col,
            corpus_hashes=self.hashes(),
        )
        # materialize before the append so the returned frame does not
        # re-read a ledger that now contains this batch's own hashes
        fresh = fresh.localCheckpoint(eager=True)
        fresh.select("content_hash").write.mode("append").parquet(self.path)
        return fresh

    def compact(self, n_files: int | None = None) -> int:
        """Rewrite the ledger's accumulated per-batch appends into
        ``n_files`` deduplicated parquet files (default: Spark's shuffle
        parallelism).  Daily appends each land as separate small files —
        after a year the ledger scan pays ~365x the open/footer overhead
        it needs; the rebuild tables it like any parquet rewriter
        (compaction D13 applied to the ledger).  Staged write + verified
        directory swap (dirswap.swap_in): a failure before the swap leaves
        the live ledger untouched; a crash mid-swap self-heals on the next
        read; the displaced copy is deleted only after the new live
        directory verifies readable.  Returns the distinct-hash count.
        """
        from .dirswap import swap_in

        distinct = self.hashes().distinct()
        if n_files:
            distinct = distinct.repartition(n_files)
        stage = f"{self.path}__compact"
        distinct.write.mode("overwrite").parquet(stage)
        n = self.spark.read.parquet(stage).count()
        swap_in(
            self.path,
            stage,
            verify=lambda p: self.spark.read.schema(LEDGER_SCHEMA)
            .parquet(p)
            .first(),
        )
        return n
