"""Streaming training-data ingest pipeline (SURVEY §2.14 extension).

The batch LLM-pipeline operators (operators/text.py, operators/dedup.py)
applied to a document STREAM: files land in a drop directory, and each
micro-batch is quality-scored, Gopher-filtered, content-hashed, and
deduplicated before reaching the corpus sink — the continuous-ingestion
shape of a training-data pipeline (the batch d01/t02/t05 queries are the
oracle for the streamed results, the same batch-equivalent-replay strategy
as streaming/events.py).

Scale notes:

* Every transform is the SAME pure Column expression the batch path uses —
  map-only, codegen'd, no Python in the hot path.
* Streaming dedup state is the content hash within the watermark horizon
  (``dropDuplicates`` keyed on the md5) — state size is bounded by the
  horizon, not the corpus.  Cross-run exact dedup against the full corpus
  is the batch ``incremental_dedup`` anti-join's job (d08), run per shard
  close — the standard lambda split: cheap in-stream horizon dedup, exact
  batch reconciliation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string,"
    " n_chars long, ingest_ts timestamp"
)


def read_document_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Document drop-directory stream; one parquet file = one micro-batch."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def read_document_stream_jsonl(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """JSONL drop-directory stream — the wire format training corpora
    actually arrive in (sources/jsonl.py is the batch twin).  Same
    projected schema; a malformed line yields NULL columns and is removed
    by the quality gate's token minimum, mirroring the batch loader's
    corrupt-line discard."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )


def quality_gate(docs: DataFrame, min_tokens: int = 5, min_score: float = 0.3) -> DataFrame:
    """Score + filter each micro-batch with the batch quality expressions
    (operators/text.quality_score — identical results to the t02 query)."""
    from ..operators import text as T

    return (
        docs.withColumn("n_tokens", T.token_count("text"))
        .withColumn("quality", T.quality_score("text"))
        .filter(
            (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_score)
        )
    )


def dedup_gate(
    docs: DataFrame, watermark: str = "1 hour", ledger=None
) -> DataFrame:
    """Streaming exact dedup on the normalized content hash within the
    watermark horizon (state-bounded; cross-shard dedup is d08's batch
    anti-join).

    Pass an ``operators.ledger.ContentHashLedger`` to ALSO drop documents
    already admitted to the corpus: a stream-static LEFT ANTI join against
    the ledger's compact hash column (never the corpus text).  The static
    side snapshots at stream start; duplicates that land after that are
    caught by the batch reconciliation pass (``ledger.ingest`` / d08)."""
    from ..operators.dedup import normalized_text

    hashed = docs.withColumn("content_hash", F.md5(normalized_text("text")))
    if ledger is not None:
        hashed = hashed.join(
            ledger.hashes(), "content_hash", "left_anti"
        )
    return hashed.withWatermark("ingest_ts", watermark).dropDuplicates(
        ["content_hash"]
    )


def ingest_pipeline(
    spark: SparkSession,
    source_dir: str,
    min_tokens: int = 5,
    min_score: float = 0.3,
    watermark: str = "1 hour",
    ledger=None,
    model_threshold: float | None = None,
) -> DataFrame:
    """The full stream: read → quality gate → [model gate] → dedup gate
    (optionally anti-joined against a persistent content-hash ledger).
    ``model_threshold`` adds the classifier stage (operators/model_filter
    — mapInPandas runs per micro-batch in Structured Streaming; the
    scorer initializes once per executor, not per batch).  Attach a sink
    with ``writeStream`` (tests drive it with availableNow + a memory
    sink; production writes parquet shards with a checkpoint)."""
    docs = read_document_stream(spark, source_dir)
    gated = quality_gate(docs, min_tokens, min_score)
    if model_threshold is not None:
        from ..operators.model_filter import filter_by_model

        gated = filter_by_model(gated, model_threshold)
    return dedup_gate(gated, watermark, ledger=ledger)


def neardup_admission_sink(
    stream: DataFrame,
    sig_ledger,
    out_dir: str,
    checkpoint: str,
    threshold: float = 0.7,
    max_bucket: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming NEAR-dup admission: each micro-batch is admitted through
    the persisted MinHash signature ledger
    (``operators.ledger.MinHashSignatureLedger``) — documents that are
    near-duplicates of ANY previously admitted document (across all prior
    batches and runs) or of a lower-id doc in the same batch are dropped;
    survivors land in ``out_dir`` and their signatures join the ledger.

    This closes the gap ``dedup_gate`` leaves open: the watermark-horizon
    ``dropDuplicates`` and the content-hash ledger anti-join are EXACT
    dedup only — a near-duplicate (boilerplate rewrap, tracking-suffix
    variant) sails through both.  Here the cross-batch check is the d21
    band-join against stored signatures, so steady-state cost per batch is
    sign-the-batch + one ledger signature scan — corpus text is never
    re-read (Lee et al. 2021 §4 incremental practice).

    Exactly-once EFFECT under foreachBatch's at-least-once replay, with no
    transaction log:

    * the ledger append is keyed by micro-batch id — a replay OVERWRITES
      ``batch-<id>/`` rather than appending twice, and the near-dup check
      excludes the batch's own doc ids from the ledger side, so a crash
      after the signature append cannot make the replay drop the whole
      batch as "dups of itself" (ledger.ingest idempotency_key contract);
    * the corpus write lands in a ``__ingest_batch=<id>`` partition via
      dynamic partition overwrite — a replayed batch rewrites its own
      partition byte-for-byte and touches nothing else.

    Returns the started StreamingQuery; callers own awaitTermination.
    """

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        survivors = sig_ledger.ingest(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            max_bucket=max_bucket,
            idempotency_key=str(batch_id),
        )
        (
            survivors.withColumn("__ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__ingest_batch")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def merge_sink(
    stream: DataFrame,
    catalog,
    table: str,
    on: str | list[str],
    checkpoint: str,
    **merge_kw,
):
    """Streaming UPSERT sink: each micro-batch MERGEs into a managed table
    (``foreachBatch`` → ``catalog.merge_into``).  Re-delivered batches
    (at-least-once after a checkpoint-recovery replay) converge to the same
    table state because MERGE on the key is idempotent for update/insert —
    the classic exactly-once-effect upsert sink.  On a date-partitioned
    target the merge rewrites only the partitions the batch touches
    (Catalog.merge_into's pruned copy-on-write), so continuous ingest cost
    tracks batch size, not table size.

    Returns the started StreamingQuery; callers own awaitTermination.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.merge_into(table, batch_df, on=on, **merge_kw)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
