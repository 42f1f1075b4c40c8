"""Streaming tests: batch-equivalent replay oracle (SURVEY §7 step 8).

The events table is split into micro-batch files, streamed through the same
expressions as the batch workload, and the final streaming state must equal
the batch answer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_samples_spark.streaming import events as SE


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Split sf0.001 events into 4 chronological files (micro-batches)."""
    src = tmp_path_factory.mktemp("event_stream")
    from sql_data_warehouse_samples_spark.workload._util import tbl

    ev = tbl(spark, "/root/testdata/sf0.001", "events").orderBy("ts")
    n = ev.count()
    rows = ev.collect()
    chunk = (n + 3) // 4
    for i in range(4):
        part = spark.createDataFrame(rows[i * chunk : (i + 1) * chunk], ev.schema)
        part.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"batch{i}"))
    # flatten: move parquet files into one dir
    flat = tmp_path_factory.mktemp("event_stream_flat")
    import glob
    import shutil

    # Spark's file stream source orders micro-batches by modification time;
    # equal mtimes from fast copies make replay order nondeterministic and a
    # whole batch can land behind the watermark.  Pin ascending mtimes.
    import time

    base_t = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "batch*", "*.parquet")))):
        dst = os.path.join(flat, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (base_t + i * 10, base_t + i * 10))
    return str(flat)


def test_tumbling_stream_matches_batch(spark, event_source):
    stream = SE.read_event_stream(spark, event_source)
    q = SE.run_to_memory(SE.tumbling_counts(stream, watermark="0 seconds"), "tumbling_out", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("tumbling_out").collect()
    }
    from sql_data_warehouse_samples_spark.workload._util import tbl

    batch = (
        tbl(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
    want = {
        (r["w"].start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()
    }
    assert got == want
    q.stop()


def test_session_stream_matches_batch(spark, event_source):
    stream = SE.read_event_stream(spark, event_source)
    q = SE.run_to_memory(
        SE.session_counts(stream, watermark="0 seconds"), "session_out", "complete"
    )
    got = {
        (r.user_id, r.session_start): r.n_events for r in spark.table("session_out").collect()
    }
    from sql_data_warehouse_samples_spark.workload._util import tbl

    batch = (
        tbl(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {(r.user_id, r["w"].start): r.n_events for r in batch.collect()}
    assert got == want
    q.stop()


def test_streaming_dedup(spark, event_source):
    stream = SE.read_event_stream(spark, event_source)
    q = SE.run_to_memory(SE.dedup_stream(stream, watermark="0 seconds"), "dedup_out")
    n_stream = spark.table("dedup_out").count()
    from sql_data_warehouse_samples_spark.workload._util import tbl

    n_batch = tbl(spark, "/root/testdata/sf0.001", "events").select("event_id").distinct().count()
    assert n_stream == n_batch
    q.stop()


def test_stateful_running_totals(spark, event_source):
    stream = SE.read_event_stream(spark, event_source)
    q = SE.run_to_memory(SE.user_running_totals(stream), "totals_out", "update")
    # final state per user: last update row must equal the batch totals
    out = spark.table("totals_out")
    latest = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    got = {r.user_id: r.n_events for r in latest}
    from sql_data_warehouse_samples_spark.workload._util import tbl

    batch = (
        tbl(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {r.user_id: r.n for r in batch}
    assert got == want
    q.stop()


def test_checkpoint_recovery_exactly_once(spark, event_source, tmp_path):
    """Durable sink + checkpoint: stop the query mid-stream, restart from the
    same checkpoint, and the parquet sink holds each event exactly once."""
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start(max_files):
        stream = (
            spark.readStream.schema(spark.read.parquet(event_source).schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(event_source)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # first run: process one file per micro-batch, stop after completion
    q = start(1)
    q.awaitTermination(120)
    first_count = spark.read.parquet(out_dir).count()
    assert first_count > 0
    # restart from the same checkpoint: nothing new to process → no dupes
    q2 = start(1)
    q2.awaitTermination(120)
    total = spark.read.parquet(event_source).count()
    sunk = spark.read.parquet(out_dir)
    assert sunk.count() == total
    assert sunk.select("event_id").distinct().count() == total


# ---------------------------------------------------------------------------
# streaming training-data ingest (streaming/ingest.py)
# ---------------------------------------------------------------------------


def test_streaming_ingest_quality_and_dedup(spark, tmp_path_factory):
    """Docs streamed through the quality+dedup gates equal the batch
    answer: same survivor hash set, exactly one row per content hash, and
    a planted cross-batch duplicate is dropped."""
    import os

    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    src = str(tmp_path_factory.mktemp("doc_stream"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
        .select(*SI.DOC_SCHEMA.replace(" long", "").replace(" string", "")
                .replace(" timestamp", "").split(", "))
    )
    rows = docs.collect()
    third = (len(rows) + 2) // 3
    batches = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    # plant a duplicate of batch-0's first doc into batch 2 (new id, same text)
    first = batches[0][0]
    dup = first.asDict()
    dup["doc_id"] = 999_999
    dup["ingest_ts"] = batches[2][-1]["ingest_ts"]
    import pyspark.sql.types as T  # noqa: F401

    batches[2] = batches[2] + [type(first)(**dup)]
    import glob
    import shutil

    for i, part in enumerate(batches):
        staged = os.path.join(src, f"_stage{i}")
        spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        shutil.move(
            glob.glob(os.path.join(staged, "part-*.parquet"))[0],
            os.path.join(src, f"b{i}.parquet"),
        )
        shutil.rmtree(staged)

    streamed = SI.ingest_pipeline(spark, src, min_tokens=5, min_score=0.3)
    q = (
        streamed.writeStream.format("memory")
        .queryName("ingest_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("ingest_out").collect()

    # batch oracle: same gates as a single batch job
    from sql_data_warehouse_samples_spark.operators import text as Tops
    from sql_data_warehouse_samples_spark.operators.dedup import normalized_text

    batch = (
        spark.read.parquet(os.path.join(src, "*.parquet"))
        .withColumn("n_tokens", Tops.token_count("text"))
        .withColumn("quality", Tops.quality_score("text"))
        .filter("n_tokens >= 5 AND quality >= 0.3")
        .withColumn("content_hash", F.md5(normalized_text("text")))
    )
    expected_hashes = {r.content_hash for r in batch.select("content_hash").collect()}
    got_hashes = [r.content_hash for r in out]
    assert set(got_hashes) == expected_hashes
    assert len(got_hashes) == len(set(got_hashes))  # exactly-once per hash
    # the planted duplicate did not survive (its hash appeared in batch 0)
    assert sum(1 for r in out if r.doc_id == 999_999) == 0


def test_streaming_dedup_gate_anti_joins_ledger(spark, tmp_path):
    """A document already admitted to the persistent content-hash ledger is
    dropped by the stream's static anti-join — without the stream ever
    reading corpus text (the static side is the ledger's hash column)."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        ContentHashLedger,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    led = ContentHashLedger(spark, str(tmp_path / "ledger"))
    led.ingest(
        spark.createDataFrame(
            [(1, "already in the corpus body")], "doc_id: long, text: string"
        )
    )
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [
            (100, "already  in the corpus body", "en", "web", 27),
            (101, "a genuinely new document", "en", "web", 24),
        ],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    ).write.parquet(src)

    streamed = SI.dedup_gate(
        SI.read_document_stream(spark, src), ledger=led
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("ledger_gate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("ledger_gate_out").collect()
    assert [r.doc_id for r in out] == [101]


def test_streaming_jsonl_ingest(spark, tmp_path_factory):
    """JSONL drop-dir stream (the corpus wire format): well-formed lines
    flow through quality+dedup gates like the parquet stream; a malformed
    line degrades to NULLs and is removed by the quality gate."""
    import json
    import os

    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    src = str(tmp_path_factory.mktemp("jsonl_stream"))
    text = "the quick brown fox jumps over the lazy dog near the river bank"
    lines = [
        json.dumps(
            {
                "doc_id": i,
                "text": f"{text} variant {i}",
                "lang": "en",
                "source": "web",
                "n_chars": len(text),
                "ingest_ts": f"2024-01-01T00:00:{i:02d}.000Z",
            }
        )
        for i in range(5)
    ]
    # duplicate content under a new id + one malformed line
    dup = json.loads(lines[0])
    dup["doc_id"] = 99
    dup["ingest_ts"] = "2024-01-01T00:01:00.000Z"
    with open(os.path.join(src, "shard0.jsonl"), "w") as f:
        f.write("\n".join(lines + [json.dumps(dup), "{not valid json"]))

    stream = SI.dedup_gate(
        SI.quality_gate(SI.read_document_stream_jsonl(spark, src))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM jsonl_ingest").collect()
    # 5 distinct docs survive; the content-dup and the corrupt line do not
    assert len(got) == 5
    assert {r.doc_id for r in got} <= set(range(5)) | {99}
    assert len({r.content_hash for r in got}) == 5


def test_streaming_model_gate(spark, tmp_path_factory):
    """The classifier gate runs inside the stream: survivors are exactly
    the quality-passing docs whose deterministic model score clears the
    threshold — identical to the batch filter_by_model answer."""
    import os

    from sql_data_warehouse_samples_spark.operators import model_filter as M
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    src = str(tmp_path_factory.mktemp("model_stream"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn(
            "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
        )
        .select("doc_id", "text", "lang", "source", "n_chars", "ingest_ts")
    )
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "_stage"))
    import glob
    import shutil

    shutil.move(
        glob.glob(os.path.join(src, "_stage", "part-*.parquet"))[0],
        os.path.join(src, "shard0.parquet"),
    )

    stream = SI.ingest_pipeline(spark, src, model_threshold=0.5)
    q = (
        stream.writeStream.format("memory")
        .queryName("model_gate")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM model_gate").collect()}

    batch = SI.dedup_gate(
        M.filter_by_model(SI.quality_gate(docs), 0.5)
    ).drop("content_hash")
    want = {r.doc_id for r in batch.collect()}
    assert got == want and got


def test_streaming_merge_sink_upsert(spark, tmp_path_factory):
    """foreachBatch MERGE sink: micro-batches upsert into a managed table
    keyed on doc_id, and replaying the whole stream from a fresh checkpoint
    converges to the identical table state (idempotent upsert)."""
    import os
    import time

    from sql_data_warehouse_samples_spark.catalog import Catalog, TableLayout
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    src = str(tmp_path_factory.mktemp("merge_stream"))
    base = tmp_path_factory.mktemp("merge_ckpt")

    def doc(i, text):
        return (i, text, "en", "web", len(text), "2024-01-01 00:00:00")

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long, ingest_ts string"
        ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    write_file("f1", [doc(1, "first version of one"), doc(2, "two arrives")])
    write_file("f2", [doc(2, "two updated later"), doc(3, "three is new")])

    cat = Catalog(spark)
    cat.create_schema("strm")
    seed = spark.createDataFrame(
        [doc(1, "stale seed row")],
        "doc_id long, text string, lang string, source string,"
        " n_chars long, ingest_ts string",
    ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
    cat.create_table_as("strm.docs", seed, TableLayout(), mode="overwrite")

    def run(ckpt):
        stream = (
            spark.readStream.schema(SI.DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = SI.merge_sink(stream, cat, "strm.docs", on="doc_id", checkpoint=ckpt)
        q.awaitTermination(120)

    run(str(base / "c1"))
    got = {r["doc_id"]: r["text"] for r in spark.table("strm.docs").collect()}
    assert got == {
        1: "first version of one",
        2: "two updated later",
        3: "three is new",
    }
    # full replay from a fresh checkpoint: same final state
    run(str(base / "c2"))
    got2 = {r["doc_id"]: r["text"] for r in spark.table("strm.docs").collect()}
    assert got2 == got
    cat.drop_schema("strm", cascade=True)


def test_stream_stream_interval_join_matches_batch(spark, event_source):
    """Stream-stream equi+interval join (bounded state): replaying the same
    events through both sides must produce exactly the batch join's pairs."""
    signups = SE.read_event_stream(spark, event_source)
    purchases = SE.read_event_stream(spark, event_source)
    joined = SE.stream_stream_conversion_join(
        signups, purchases, within="2 hours", watermark="0 seconds"
    )
    q = SE.run_to_memory(joined, "ss_join_out", "append")
    got = {
        (r.user_id, r.signup_ts, r.purchase_ts): (
            r.purchase_value,
            r.seconds_to_convert,
        )
        for r in spark.table("ss_join_out").collect()
    }

    from sql_data_warehouse_samples_spark.workload._util import tbl

    ev = tbl(spark, "/root/testdata/sf0.001", "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 2 hours")),
    )
    want = {
        (r.user_id, r.signup_ts, r.purchase_ts): (
            r.purchase_value,
            # same floor-to-second semantics as unix_timestamp() on each side
            int(r.purchase_ts.timestamp()) - int(r.signup_ts.timestamp()),
        )
        for r in batch.collect()
    }
    assert want, "fixture must produce at least one conversion pair"
    assert got == want


def _write_doc_batches(spark, src, batches, schema):
    """One parquet FILE per batch (maxFilesPerTrigger=1 -> one micro-batch
    per file), same staging convention as the ingest tests above."""
    import glob
    import shutil

    for i, part in enumerate(batches):
        staged = os.path.join(src, f"_stage{i}")
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        shutil.move(
            glob.glob(os.path.join(staged, "part-*.parquet"))[0],
            os.path.join(src, f"b{i}.parquet"),
        )
        shutil.rmtree(staged)


def _doc_row(doc_id, text):
    import datetime

    return (
        doc_id,
        text,
        "en",
        "web",
        len(text),
        datetime.datetime(2024, 1, 1, 0, 0, int(doc_id) % 60),
    )


def test_streaming_neardup_admission_sink(spark, tmp_path):
    """Cross-BATCH near-dups are dropped at admission: a later micro-batch's
    lightly-edited copy of an earlier batch's document never reaches the
    corpus sink, without the stream ever re-reading admitted text (the
    check runs against the persisted signature ledger)."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        MinHashSignatureLedger,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.rsplit(" ", 1)[0] + " tokX"  # ~0.9 shingle Jaccard
    other = " ".join(f"alpha{i}" for i in range(60))
    third = " ".join(f"beta{i}" for i in range(60))

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark,
        src,
        [
            [_doc_row(1, base), _doc_row(2, other)],
            [_doc_row(10, near), _doc_row(11, third)],
        ],
        SI.DOC_SCHEMA,
    )

    led = MinHashSignatureLedger(spark, str(tmp_path / "sigledger"))
    out_dir = str(tmp_path / "corpus")
    q = SI.neardup_admission_sink(
        SI.read_document_stream(spark, src),
        led,
        out_dir,
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.7,
    )
    q.awaitTermination()

    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got == {1, 2, 11}  # 10 dropped as near-dup of 1, across batches
    # ledger holds signatures for exactly the admitted docs
    led_ids = {r.doc_id for r in led.signatures().select("doc_id").collect()}
    assert led_ids == {1, 2, 11}
    # corpus rows carry their admitting micro-batch partition
    parts = {
        r["__ingest_batch"]
        for r in spark.read.parquet(out_dir).select("__ingest_batch").collect()
    }
    assert parts == {0, 1}
    # restart with the same checkpoint and no new files: nothing changes
    q2 = SI.neardup_admission_sink(
        SI.read_document_stream(spark, src),
        led,
        out_dir,
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.7,
    )
    q2.awaitTermination()
    assert {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()} == {1, 2, 11}


def test_neardup_ledger_keyed_ingest_replay_idempotent(spark, tmp_path):
    """The crash-replay contract behind the admission sink: re-running
    ingest with the SAME idempotency key — including after the signature
    append already happened (crash between append and corpus write) —
    returns the same survivors and converges to the same ledger state."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        MinHashSignatureLedger,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.rsplit(" ", 1)[0] + " tokX"
    other = " ".join(f"alpha{i}" for i in range(60))

    led = MinHashSignatureLedger(spark, str(tmp_path / "led"))
    b0 = spark.createDataFrame([(1, base)], "doc_id: long, text: string")
    led.ingest(b0)  # plain (un-keyed) append: flat files at the root

    b1 = spark.createDataFrame(
        [(10, near), (11, other)], "doc_id: long, text: string"
    )
    s1 = {r.doc_id for r in led.ingest(b1, idempotency_key="7").collect()}
    assert s1 == {11}  # 10 is a near-dup of admitted doc 1
    # replay AFTER the append (the dangerous half of the crash window):
    # without the own-id exclusion, 11 would now look like a dup of itself
    s2 = {r.doc_id for r in led.ingest(b1, idempotency_key="7").collect()}
    assert s2 == {11}
    # ledger state converged: one signature row per admitted doc
    sigs = led.signatures().groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in sigs} == {1: 1, 11: 1}
    # mixed flat + keyed layout survives compaction (subdirs fold away)
    assert led.compact() == 2
    assert {r.doc_id for r in led.signatures().collect()} == {1, 11}


def test_streaming_contamination_gate_matches_batch_exact(spark, tmp_path):
    """The map-only streaming contamination gate admits exactly the docs
    the batch exact check admits (on this corpus the Bloom has no false
    positives — deterministic, so the equality is a hard assertion), and
    its one-sided contract holds: no contaminated doc is ever admitted."""
    from sql_data_warehouse_samples_spark.operators.dedup import (
        BloomGramFilter,
        contaminated_ids,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    clean1 = " ".join(f"tok{i}" for i in range(40))
    clean2 = " ".join(f"word{i}" for i in range(40))
    contaminated = f"prefix text {bench_gram} suffix text here"
    short = "too short"  # < n tokens: zero grams, must be admitted
    rows = [
        _doc_row(1, clean1),
        _doc_row(2, contaminated),
        _doc_row(3, clean2),
        _doc_row(4, short),
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(spark, src, [rows[:2], rows[2:]], SI.DOC_SCHEMA)

    bloom = BloomGramFilter(bench)
    gated = SI.contamination_gate(
        SI.read_document_stream(spark, src), bloom=bloom
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("decon_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id for r in spark.sql("select doc_id from decon_gate").collect()
    }

    docs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id: long, text: string"
    )
    bad = {r.doc_id for r in contaminated_ids(docs, bench).collect()}
    assert bad == {2}
    assert got == {1, 3, 4}
    # one-sided: contaminated never admitted (independent of FP luck)
    assert not (got & bad)
    # exactly one of benchmark/bloom must be passed
    with pytest.raises(ValueError):
        SI.contamination_gate(docs, benchmark=bench, bloom=bloom)
    with pytest.raises(ValueError):
        SI.contamination_gate(docs)


def test_streaming_full_admission_sink(spark, tmp_path):
    """End-to-end production admission: decontamination + exact dedup +
    near dedup compose in ONE foreachBatch sink — a contaminated doc, an
    exact dup and a cross-batch near-dup are all rejected; survivors land
    in the corpus with batch partitions; replaying the checkpoint changes
    nothing (exactly-once effect)."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.rsplit(" ", 1)[0] + " tokX"  # ~0.9 shingle Jaccard vs base
    other = " ".join(f"word{i}" for i in range(60))
    fresh = " ".join(f"new{i}" for i in range(60))
    poisoned = f"prefix text {bench_gram} suffix text here"

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark,
        src,
        [
            [_doc_row(1, base), _doc_row(2, other), _doc_row(3, poisoned)],
            [_doc_row(10, near), _doc_row(11, other), _doc_row(12, fresh)],
        ],
        SI.DOC_SCHEMA,
    )

    pipe = AdmissionPipeline(spark, str(tmp_path / "ledgers"))
    out_dir = str(tmp_path / "corpus")

    def run():
        q = SI.admission_sink(
            SI.read_document_stream(spark, src),
            pipe,
            out_dir,
            checkpoint=str(tmp_path / "ckpt"),
            benchmark=bench,
        )
        q.awaitTermination()

    run()
    got = spark.read.parquet(out_dir)
    # 3 contaminated; 10 near-dup of 1 (cross-batch); 11 exact dup of 2
    assert {r.doc_id for r in got.select("doc_id").collect()} == {1, 2, 12}
    assert {
        r["__ingest_batch"] for r in got.select("__ingest_batch").collect()
    } == {0, 1}
    # exact ledger: admitted docs PLUS the near-stage reject (doc 10) —
    # the AdmissionPipeline's documented contract (an exact replay of a
    # near-dup reject is dropped by the exact ledger directly)
    exact_hashes = {r.content_hash for r in pipe.exact.hashes().collect()}
    assert exact_hashes >= {
        r.content_hash for r in got.select("content_hash").collect()
    }
    assert len(exact_hashes) == 4
    assert {
        r.doc_id for r in pipe.near.signatures().select("doc_id").collect()
    } == {1, 2, 12}
    # checkpoint replay with no new files: corpus and ledgers unchanged
    run()
    assert {
        r.doc_id
        for r in spark.read.parquet(out_dir).select("doc_id").collect()
    } == {1, 2, 12}
    assert {
        r.doc_id for r in pipe.near.signatures().select("doc_id").collect()
    } == {1, 2, 12}


def test_ingest_pipeline_with_benchmark_gate(spark, tmp_path):
    """ingest_pipeline(benchmark=...) inserts the contamination gate
    between the quality and dedup gates: a quality-passing contaminated
    doc is dropped; clean docs flow through unchanged."""
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval {bench_gram} answer")], "doc_id: long, text: string"
    )
    clean = " ".join(f"tok{i}" for i in range(40)) + "."
    poisoned = f"prefix words {bench_gram} suffix words here."
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark, src, [[_doc_row(1, clean), _doc_row(2, poisoned)]], SI.DOC_SCHEMA
    )
    out = SI.ingest_pipeline(spark, src, benchmark=bench)
    q = (
        out.writeStream.format("memory")
        .queryName("pipe_bench_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id
        for r in spark.sql("select doc_id from pipe_bench_gate").collect()
    }
    assert got == {1}


def test_contamination_gate_quarantine_adjudication(spark, tmp_path):
    """annotate mode gives the gate's over-drop a quarantine surface: the
    flagged rows are routed aside instead of dropped on the floor, and the
    exact batch d23 adjudication (Bloom + string-verify) over the
    quarantine separates the truly contaminated from any Bloom
    false-positive over-drop."""
    from sql_data_warehouse_samples_spark.operators.dedup import (
        BloomGramFilter,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"tok{i}" for i in range(40))),
            (2, f"prefix text {bench_gram} suffix text here"),
            (3, " ".join(f"word{i}" for i in range(40))),
        ],
        "doc_id: long, text: string",
    )

    bloom = BloomGramFilter(bench)
    annotated = SI.contamination_gate(docs, bloom=bloom, mode="annotate")
    # annotate adds ONE boolean — still map-only (append-safe plan shape)
    assert "Exchange" not in annotated._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r.contaminated_maybe for r in annotated.collect()}
    assert set(rows) == {1, 2, 3}  # nothing dropped in annotate mode

    # equivalence: flag==false  ==  filter-mode survivors
    survivors = {
        r.doc_id
        for r in SI.contamination_gate(docs, bloom=bloom).select("doc_id").collect()
    }
    assert {d for d, flagged in rows.items() if not flagged} == survivors

    # exact adjudication over the quarantine: only doc 2 truly shares a
    # benchmark 8-gram; any over-dropped clean doc is cleared
    quarantine = annotated.filter(F.col("contaminated_maybe")).drop(
        "contaminated_maybe"
    )
    truly = {
        r.doc_id
        for r in bloom.contaminated_ids(
            quarantine, text_col="text", id_col="doc_id", verify=True
        ).collect()
    }
    assert truly == {2}
    cleared = {r.doc_id for r in quarantine.collect()} - truly
    assert cleared.isdisjoint({2})

    # a deliberately under-sized Bloom (1 bit/gram) over-drops clean docs
    # with near-certainty; adjudication still returns EXACTLY the truly
    # contaminated set, clearing the over-drop — the lambda split works
    tiny = BloomGramFilter(bench, bits_per_gram=1)
    ann2 = SI.contamination_gate(docs, bloom=tiny, mode="annotate")
    quarantine2 = ann2.filter(F.col("contaminated_maybe")).drop(
        "contaminated_maybe"
    )
    assert {
        r.doc_id
        for r in tiny.contaminated_ids(
            quarantine2, text_col="text", id_col="doc_id", verify=True
        ).collect()
    } == {2}


def test_admission_sink_reject_audit_surface(spark, tmp_path):
    """reject_dir captures every non-admitted document with its reason
    (contaminated vs rejected_dedup), batch-partitioned like the corpus
    so replays converge; admitted + rejected = the whole input."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.rsplit(" ", 1)[0] + " tokX"
    poisoned = f"prefix text {bench_gram} suffix text here"

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark,
        src,
        [
            [_doc_row(1, base), _doc_row(3, poisoned)],
            [_doc_row(10, near), _doc_row(11, base)],
        ],
        SI.DOC_SCHEMA,
    )

    pipe = AdmissionPipeline(spark, str(tmp_path / "ledgers"))
    out_dir = str(tmp_path / "corpus")
    reject_dir = str(tmp_path / "rejects")

    def run():
        q = SI.admission_sink(
            SI.read_document_stream(spark, src),
            pipe,
            out_dir,
            checkpoint=str(tmp_path / "ckpt"),
            benchmark=bench,
            reject_dir=reject_dir,
        )
        q.awaitTermination()

    run()
    admitted = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    rejects = spark.read.parquet(reject_dir)
    by_reason = {
        (r.doc_id, r.reason) for r in rejects.select("doc_id", "reason").collect()
    }
    assert admitted == {1}
    assert by_reason == {
        (3, "contaminated"),        # shares a benchmark 8-gram
        (10, "rejected_dedup"),     # near-dup of 1, cross-batch
        (11, "rejected_dedup"),     # exact dup of 1
    }
    # the audit is exhaustive: admitted + rejected = input
    assert admitted | {d for d, _ in by_reason} == {1, 3, 10, 11}
    # replays rewrite their own partitions — nothing duplicates
    run()
    assert rejects.count() == 3
    assert {
        r["__ingest_batch"] for r in rejects.select("__ingest_batch").collect()
    } == {0, 1}
