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
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """The full stream: read → quality gate → [model gate] →
    [contamination gate] → dedup gate (optionally anti-joined against a
    persistent content-hash ledger).  ``model_threshold`` adds the
    classifier stage (operators/model_filter — mapInPandas runs per
    micro-batch in Structured Streaming; the scorer initializes once per
    executor, not per batch).  ``benchmark`` adds the one-sided Bloom
    ``contamination_gate`` (built once at stream construction).  Attach a
    sink with ``writeStream`` (tests drive it with availableNow + a
    memory sink; production writes parquet shards with a checkpoint)."""
    docs = read_document_stream(spark, source_dir)
    gated = quality_gate(docs, min_tokens, min_score)
    if model_threshold is not None:
        from ..operators.model_filter import filter_by_model

        gated = filter_by_model(gated, model_threshold)
    if benchmark is not None:
        gated = contamination_gate(gated, benchmark=benchmark)
    return dedup_gate(gated, watermark, ledger=ledger)


def _run_scoped_key(checkpoint: str, batch_id: int) -> str:
    """Idempotency key for a micro-batch, scoped by the streaming query id.

    Micro-batch ids restart at 0 when a checkpoint is RESET, so a raw
    ``str(batch_id)`` key would collide across checkpoint generations and
    the keyed ``batch-<key>/`` overwrite would destroy the old
    generation's ledger rows (the ledgers now refuse such reuse loudly).
    Spark pins a query id in ``<checkpoint>/metadata`` at query start —
    stable across restarts of the SAME checkpoint (replays keep their
    key), fresh when the checkpoint is reset (no collision).  Falls back
    to the raw batch id if the metadata is unreadable (pre-start calls,
    exotic checkpoint stores) — with a LOUD warning, because the fallback
    reinstates exactly the cross-generation collision this function
    exists to prevent: the first colliding batch would then abort the
    stream on the ledger's key-reuse guard, and operators should learn
    the keys are unscoped before that happens."""
    import json
    import logging
    import os

    from ..operators.dirswap import fs_read_bytes

    try:
        # scheme-dispatched read: a remote checkpoint store (hdfs/abfs)
        # must yield the scoped key too, not fall into the unscoped-key
        # warning below (the "exotic checkpoint stores" escape hatch is
        # now only for stores Hadoop cannot open)
        qid = str(
            json.loads(fs_read_bytes(os.path.join(checkpoint, "metadata")))[
                "id"
            ]
        )
        return f"{qid.replace('-', '')[:12]}-{batch_id}"
    # broad on purpose: a remote-store miss surfaces as a Py4J-wrapped
    # java.io exception, not OSError — any unreadable metadata takes the
    # loud fallback, never aborts the stream here
    except Exception as exc:
        logging.getLogger(__name__).warning(
            "checkpoint %r has no readable query-id metadata (%s); "
            "falling back to the UNSCOPED batch id %r as the ledger "
            "idempotency key — a checkpoint reset will collide with this "
            "key and the ledger's key-reuse guard will abort the stream",
            checkpoint,
            exc,
            str(batch_id),
        )
        return str(batch_id)


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

    * the ledger append is keyed by a run-scoped micro-batch key
      (``_run_scoped_key``) — a replay OVERWRITES ``batch-<key>/`` rather
      than appending twice, and the near-dup check excludes the batch's
      own prior rows by their stored ``batch_key`` column, so a crash
      after the signature append cannot make the replay drop the whole
      batch as "dups of itself" (ledger.ingest idempotency_key contract);
    * the corpus write lands in a ``__ingest_batch=<id>`` partition via
      dynamic partition overwrite — a replayed batch rewrites its own
      partition byte-for-byte and touches nothing else.

    CONCURRENCY: run ONE admission sink per driver process — the ledger's
    hot-path cache registry (dedup._HOT_CACHES) is process-global with
    release-on-entry semantics, so two concurrent sinks on one session
    would release each other's caches mid-batch (results stay correct;
    the persist() benefit silently degrades to recompute).

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
            idempotency_key=_run_scoped_key(checkpoint, batch_id),
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


def contamination_gate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    bloom=None,
    text_col: str = "text",
    n: int = 8,
    bits_per_gram: int = 16,
    mode: str = "filter",
) -> DataFrame:
    """Drop documents that (maybe) share a word n-gram with a benchmark/
    eval set — the streaming face of d23's Bloom decontamination.

    Append-mode safe by construction: the verdict is ONE map-only boolean
    per document (``BloomGramFilter.any_gram_maybe`` — gram hash arrays
    into a single Arrow kernel), no explode, no join, no aggregation
    state.  The gate is ONE-SIDED: a truly contaminated document is never
    admitted (Bloom has no false negatives); a ~FP-rate fraction of clean
    documents (~0.04% of docs-with-a-colliding-gram at 16 bits/gram) is
    over-dropped.  That asymmetry is the right default for training-data
    admission — losing 1-in-2500 clean docs is noise, leaking one eval
    doc poisons the benchmark.

    ``mode`` controls what happens to the maybe-contaminated residue:

    * ``"filter"`` (default) — drop it; the stream carries survivors only.
    * ``"annotate"`` — keep every row and add a ``contaminated_maybe``
      boolean instead (still ONE map-only projection, still append-safe).
      The caller routes flagged rows to a QUARANTINE (e.g.
      ``partitionBy("contaminated_maybe")`` at the sink) and adjudicates
      them exactly with the batch d23 query over the quarantine —
      ``BloomGramFilter.contaminated_ids(quarantine, verify=True)``
      separates the truly contaminated from the ~FP-rate over-drop (the
      lambda split the dedup gate documents; test-proven in
      tests/test_streaming.py::test_contamination_gate_quarantine_adjudication).

    Pass a prebuilt ``BloomGramFilter`` (``bloom=``) to share one
    broadcast across gates; otherwise one is built from ``benchmark``
    at stream-construction time (static side, built exactly once).
    """
    from ..operators.dedup import BloomGramFilter, ngram_strings

    if (benchmark is None) == (bloom is None):
        raise ValueError("pass exactly one of benchmark / bloom")
    if mode not in ("filter", "annotate"):
        raise ValueError(f"mode must be 'filter' or 'annotate', got {mode!r}")
    if bloom is None:
        bloom = BloomGramFilter(benchmark, text_col=text_col, n=n,
                                bits_per_gram=bits_per_gram)
    # materialize the gram array ONCE (tokenize+slice+concat per gram is
    # the expensive part); both hash transforms reference the attribute
    with_g = docs.withColumn(
        "__cg_grams", F.array_distinct(ngram_strings(text_col, bloom.n))
    )
    if mode == "annotate":
        return with_g.withColumn(
            "contaminated_maybe", bloom.any_gram_maybe("__cg_grams", grams=True)
        ).drop("__cg_grams")
    return with_g.filter(
        ~bloom.any_gram_maybe("__cg_grams", grams=True)
    ).drop("__cg_grams")


def _prune_settled_tombstones(
    spark, index_path: str, current_key: str, batch_id: int, margin: int
) -> int:
    """The engine-driven half of tombstone retention: micro-batches this
    run committed ≥ ``margin`` batches ago can never replay (Spark's
    commit log gates batch construction on the previous commit), so
    their forget-tombstones are dead weight — prune them.  Only THIS
    run's keys are touched (``<qid12>-<n>`` sharing ``current_key``'s
    prefix): other checkpoint generations' keys are equally unreplayable
    after a reset, but whether the old checkpoint is retired is operator
    knowledge, not engine knowledge — those stay for
    ``maintenance.prune_search_tombstones``.  Cost: one distinct over
    the tombstone table (deletion-bounded, usually empty)."""
    import os

    from ..operators.bm25 import _has_parquet_data, prune_tombstones

    ts_dir = os.path.join(index_path, "tombstones")
    if not _has_parquet_data(ts_dir):
        return 0
    sk = str(batch_id)
    if current_key == sk:
        # Unscoped-key fallback (already warned loudly at key
        # construction): with no run-scoped prefix, an all-digit __bk is
        # indistinguishable from an operator-chosen numeric idempotency
        # key (e.g. '20240101') or a PRIOR unscoped generation's batch —
        # neither is provably settled by THIS run's commit log, and
        # pruning one brings back the pruned-key-replay-resurrects
        # hazard.  Engine-driven pruning stays off entirely; those keys
        # belong to operator-driven maintenance.prune_search_tombstones.
        return 0
    elif current_key.endswith("-" + sk):
        prefix = current_key[: -len(sk)]  # keeps the trailing '-'
    else:  # defensive: unknown key shape — prune nothing
        return 0
    from ..operators.dirswap import read_path

    settled = []
    for r in (
        spark.read.parquet(read_path(ts_dir))
        .select("__bk")
        .distinct()
        .collect()
    ):
        bk = r["__bk"]
        if not (isinstance(bk, str) and bk.startswith("k-" + prefix)):
            continue
        tail = bk[len("k-" + prefix):]
        if tail.isdigit() and int(tail) <= batch_id - margin:
            settled.append(bk[2:])  # user-facing key: drop the "k-"
    if not settled:
        return 0
    return prune_tombstones(spark, ts_dir, settled)


def admission_sink(
    stream: DataFrame,
    pipeline,
    out_dir: str,
    checkpoint: str,
    benchmark: DataFrame | None = None,
    n: int = 8,
    bits_per_gram: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    reject_dir: str | None = None,
    bm25_index=None,
    ivf_index=None,
    vec_col: str = "embedding",
    bloom_path: str | None = None,
    prune_settled_after: int | None = None,
    lease=None,
):
    """The FULL training-corpus admission sink: each micro-batch is
    (1) exactly decontaminated against the benchmark (Bloom prefilter +
    string-verify semi-join — batch-side, so the verify join is legal and
    the output EXACTLY equals d07/d23, no over-drop), then (2) admitted
    through ``operators.ledger.AdmissionPipeline`` — exact content-hash
    dedup and MinHash near-dedup against everything previously admitted,
    one batch-text read, corpus text never re-read — and survivors land
    in ``out_dir``.

    This composes the round's pieces into the one call a production
    ingest actually runs: quality/model gates upstream (``ingest_pipeline``
    transforms), contamination + dedup + ledger append + corpus write
    here.  Exactly-once EFFECT under foreachBatch replay, with no
    transaction log, by the same two mechanisms as
    ``neardup_admission_sink``: ledger appends keyed by a run-scoped
    micro-batch key (replays overwrite ``batch-<key>/`` and exclude their
    own prior appends from the corpus side), and the corpus write in an
    ``__ingest_batch=<id>`` dynamic-overwrite partition.

    The Bloom is built ONCE here (static benchmark side) and broadcast;
    per-batch contamination cost is batch grams × one Arrow membership
    kernel + a semi-join probing only maybe-hits.  ``bloom_path`` makes
    the build durable across RESTARTS: the filter (bits + grams +
    benchmark-snapshot signature) persists there, and a resumed stream
    reloads it after one signature aggregate over the benchmark —
    re-paying the gram build only when the benchmark actually changed
    (operators.dedup.ensure_bloom).

    ``reject_dir`` (optional) is the audit surface a production ingest
    wants: every NON-admitted document lands there with a ``reason``
    column (``contaminated`` — exactly verified against the benchmark —
    or ``rejected_dedup`` — exact/near duplicate of admitted content),
    partitioned by micro-batch like the corpus so a replayed batch
    rewrites its own reject partition and nothing else.  Cost: two
    batch-sized anti-joins — the corpus is never touched.

    ``bm25_index`` (optional, an ``operators.bm25.Bm25Index``) keeps a
    SERVING lexical index in lockstep with the corpus: each micro-batch's
    survivors are ingested incrementally (batch-sized work, new files
    inside the term buckets) under the SAME run-scoped key as the ledger
    append, so a crash-replay dynamic-overwrites only its own index
    subpartitions and the index's key-reuse guard refuses cross-
    generation collisions — admitted docs become searchable
    exactly-once, rejected/contaminated docs never enter the index.

    ``ivf_index`` (optional, an ``operators.similarity.IvfIndex``) does
    the same for the VECTOR index: each micro-batch's survivors are added
    under the frozen quantizer with the SAME run-scoped key
    (``IvfIndex.add(idempotency_key=...)`` — (centroid, batch-key)
    subpartitions, dynamic overwrite, stored-subset key-reuse guard), so
    BOTH serving indexes stay in exactly-once lockstep with the corpus.
    Requires the stream schema to carry the embedding column
    (``vec_col``) — production pipelines embed upstream of admission.
    An ``operators.similarity.IvfPqIndex`` satisfies the same
    ``add(batch, id_col, vec_col, idempotency_key)`` interface, so a
    compressed serving index can ride the slot instead.

    ``prune_settled_after`` (optional int) closes the tombstone-retention
    loop end-to-end: once the sink is processing micro-batch N, Spark's
    commit log already holds every batch ≤ N-1, so those batches' keys
    can NEVER replay — they are settled by the engine itself, no operator
    judgment needed.  With this set to ``m``, each batch prunes both
    serving indexes' forget-tombstones for this run's keys of batches
    ≤ N-m (``m=1`` is the tight engine-guaranteed bound; larger adds
    margin for operators who also replay batches by hand).  Cost per
    batch: one tombstone-table-sized distinct (usually empty → free);
    keys from other checkpoint generations are left for
    ``maintenance.prune_search_tombstones`` (a reset generation's keys
    are also unreplayable, but only the operator knows the old
    checkpoint is truly retired).

    CONCURRENCY: one admission sink per driver process (see
    ``neardup_admission_sink`` — the shared dedup._HOT_CACHES registry
    assumes a single top-level admission op in flight).

    ``lease`` (a ``maintenance.WriterLease``): makes the single-writer
    contract CHECKED — the sink acquires the lease under the identity
    ``admission_sink:<checkpoint>`` at start (refused loudly while a
    different writer holds it; a crash-restart of the same sink
    re-acquires its own identity) and re-verifies its fencing token at
    every micro-batch, so a maintenance takeover (``run_quiesced``) or a
    misconfigured second writer fails THIS stream before it can race a
    compaction, instead of double-writing.

    Returns the started StreamingQuery; callers own awaitTermination.
    """
    from ..operators.dedup import BloomGramFilter, ensure_bloom

    lease_token = (
        lease.acquire(f"admission_sink:{checkpoint}")
        if lease is not None
        else None
    )

    if benchmark is None:
        bloom = None
    elif bloom_path is not None:
        bloom = ensure_bloom(
            stream.sparkSession, bloom_path, benchmark,
            text_col=text_col, n=n, bits_per_gram=bits_per_gram,
        )
    else:
        bloom = BloomGramFilter(benchmark, text_col=text_col, n=n,
                                bits_per_gram=bits_per_gram)

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        if lease is not None:
            lease.require(lease_token)  # fail BEFORE writing if displaced
        if batch_df.isEmpty():
            return
        clean = batch_df
        contaminated = None
        if bloom is not None:
            bad = bloom.contaminated_ids(
                batch_df, text_col=text_col, id_col=id_col, verify=True
            )
            clean = batch_df.join(bad, id_col, "left_anti")
            if reject_dir is not None:
                contaminated = batch_df.join(bad, id_col, "left_semi")
        survivors = pipeline.admit(
            clean,
            text_col=text_col,
            id_col=id_col,
            idempotency_key=_run_scoped_key(checkpoint, batch_id),
        )
        (
            survivors.withColumn("__ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__ingest_batch")
            .parquet(out_dir)
        )
        if (bm25_index is not None or ivf_index is not None) and (
            not survivors.isEmpty()
        ):
            if bm25_index is not None:
                bm25_index.ingest(
                    survivors.select(id_col, text_col),
                    text_col=text_col,
                    idempotency_key=_run_scoped_key(checkpoint, batch_id),
                )
            if ivf_index is not None:
                ivf_index.add(
                    survivors.select(id_col, vec_col),
                    id_col=id_col,
                    vec_col=vec_col,
                    idempotency_key=_run_scoped_key(checkpoint, batch_id),
                )
        if prune_settled_after is not None:
            # margin < 1 would prune THIS batch's own key while its
            # commit is still pending — a crash here replays it and the
            # replay would resurrect forgotten docs; 1 is the engine-
            # guaranteed floor (batch N runs only after N-1 committed)
            if prune_settled_after < 1:
                raise ValueError(
                    "prune_settled_after must be >= 1: the current "
                    "batch's key is not settled until its commit lands"
                )
            key = _run_scoped_key(checkpoint, batch_id)
            for idx in (bm25_index, ivf_index):
                if idx is not None:
                    _prune_settled_tombstones(
                        batch_df.sparkSession, idx.path, key, batch_id,
                        prune_settled_after,
                    )
        if reject_dir is not None:
            dedup_rejects = (
                clean.join(
                    survivors.select(id_col), id_col, "left_anti"
                ).withColumn("reason", F.lit("rejected_dedup"))
            )
            rejects = dedup_rejects
            if contaminated is not None:
                rejects = contaminated.withColumn(
                    "reason", F.lit("contaminated")
                ).unionByName(dedup_rejects)
            if not rejects.isEmpty():  # batch-sized check; keeps an
                # all-admitted stream from leaving a schemaless empty dir
                (
                    rejects.withColumn("__ingest_batch", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__ingest_batch")
                    .parquet(reject_dir)
                )
            else:
                # a REPLAY that converges to zero rejects writes nothing —
                # dynamic overwrite never touches the partition, so a prior
                # attempt's stale reject rows would survive and the audit
                # surface would over-report for this batch.  Clear the
                # batch's partition explicitly instead of skipping — via
                # the Hadoop FileSystem API, so the cleanup works on any
                # store the sink can write to (HDFS/S3/local), not just a
                # local path.
                spark = batch_df.sparkSession
                stale = spark._jvm.org.apache.hadoop.fs.Path(
                    reject_dir, f"__ingest_batch={batch_id}"
                )
                fs = stale.getFileSystem(
                    spark._jsc.hadoopConfiguration()
                )
                if fs.exists(stale):
                    fs.delete(stale, True)

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
