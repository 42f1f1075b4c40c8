"""Round-8 hardening: compact() keeps (sig, batch_key) rows paired,
drift rejects NULL sides, ROC-AUC continuous-score guard, reject-audit
replay clears stale partitions, unscoped-key fallback warns, and
decode_image_stats survives any decoder failure.
"""

from __future__ import annotations

import logging
import os

import pytest


def _text(prefix: str, n: int = 60) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_sig_ledger_compact_keeps_two_key_rows_paired(spark, tmp_path):
    """A doc_id legally admitted under two keys (second batch's content is
    NOT a near-dup of the first) stores two (sig, batch_key) rows.
    Pre-fix, compact() aggregated max(sig) and max(batch_key) PER DOC
    INDEPENDENTLY — collapsing them into one mismatched row, so one
    batch's signature silently left the ledger (future near-dups of that
    content admitted) and the key-reuse guard could spuriously refuse a
    legitimate crash-replay.  Full-row compaction keeps both."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        MinHashSignatureLedger,
    )

    led = MinHashSignatureLedger(spark, str(tmp_path / "led"))
    text_a, text_b = _text("tok"), _text("alpha")
    ba = spark.createDataFrame([(1, text_a)], "doc_id: long, text: string")
    bb = spark.createDataFrame([(1, text_b)], "doc_id: long, text: string")
    assert led.ingest(ba, idempotency_key="ka").count() == 1
    # different content, same doc_id, different key: legal (not a near-dup)
    assert led.ingest(bb, idempotency_key="kb").count() == 1

    assert led.compact(n_files=1) == 2  # both rows survive, full-row grain
    rows = led.signatures().collect()
    assert {r.batch_key for r in rows} == {"ka", "kb"}
    sigs = {r.batch_key: list(r.sig) for r in rows}
    assert sigs["ka"] != sigs["kb"]  # each key keeps ITS OWN signature

    # crash-replay of EITHER batch under its own key stays legal — the
    # key-reuse guard sees the correctly-paired stored signature
    assert led.ingest(ba, idempotency_key="ka").count() == 1
    assert led.ingest(bb, idempotency_key="kb").count() == 1

    # and near-dups of BOTH contents are still rejected post-compact —
    # pre-fix, whichever signature compact() dropped admitted its near-dup
    near_a = text_a.rsplit(" ", 1)[0] + " tokX"
    near_b = text_b.rsplit(" ", 1)[0] + " alphaX"
    probe = spark.createDataFrame(
        [(50, near_a), (51, near_b)], "doc_id: long, text: string"
    )
    assert led.ingest(probe, idempotency_key="kp").count() == 0


def test_drift_null_side_rejected(spark):
    """A NULL in side_col passed the exactly-2-values check, but the pivot
    compares with `==`, which is NULL for NULL — that side's counts all
    became 0 and the drift output was silently garbage.  Now rejected."""
    from sql_data_warehouse_samples_spark.operators.evalmetrics import (
        token_distribution_drift,
    )

    docs = spark.createDataFrame(
        [("a", "x y z"), (None, "x y q")], "snap: string, text: string"
    )
    with pytest.raises(ValueError, match="non-NULL"):
        token_distribution_drift(docs, "snap")


def test_roc_auc_max_distinct_scores_guard(spark):
    """Continuous-score cost guard: when the distinct-score count exceeds
    max_distinct_scores, scores are pre-bucketed (equal-width bins) so the
    ordered window stays bounded; default behavior is byte-identical."""
    from sql_data_warehouse_samples_spark.operators.evalmetrics import roc_auc

    rows = [(i / 97.0 + (0.31 if i % 3 == 0 else 0.0), 1 if i % 3 == 0 else 0)
            for i in range(97)]
    df = spark.createDataFrame(rows, "score: double, label: int")

    # brute-force exact AUC (pairwise) as the reference
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    expect = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))

    exact = roc_auc(df, "score", "label").collect()[0]
    assert exact.auc == pytest.approx(expect, abs=1e-6)
    assert exact.n_distinct_scores == len({s for s, _ in rows})

    # a bound ABOVE the observed cardinality changes nothing
    same = roc_auc(df, "score", "label", max_distinct_scores=10_000).collect()[0]
    assert same == exact

    # a binding bound caps the window size; AUC is the binned approximation
    binned = roc_auc(df, "score", "label", max_distinct_scores=8).collect()[0]
    assert binned.n_distinct_scores <= 8
    assert binned.n_pos == exact.n_pos and binned.n_neg == exact.n_neg
    assert binned.auc == pytest.approx(expect, abs=0.1)

    with pytest.raises(ValueError, match="max_distinct_scores"):
        roc_auc(df, "score", "label", max_distinct_scores=0)


def test_admission_sink_replay_clears_stale_reject_partition(spark, tmp_path):
    """A replayed batch that converges to ZERO rejects writes nothing via
    dynamic overwrite — pre-fix the prior attempt's stale reject rows
    survived and the audit surface over-reported.  The sink now clears the
    batch's reject partition explicitly when its reject set is empty."""
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI
    from tests.test_streaming import _doc_row, _write_doc_batches

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark,
        src,
        [[_doc_row(1, _text("tok")), _doc_row(2, _text("alpha"))]],
        SI.DOC_SCHEMA,
    )
    reject_dir = str(tmp_path / "rejects")
    # simulate a prior attempt of batch 0 that recorded a (now stale)
    # reject before crashing pre-checkpoint-commit
    stale = os.path.join(reject_dir, "__ingest_batch=0")
    os.makedirs(stale)
    spark.createDataFrame(
        [(2, "stale", "rejected_dedup")], "doc_id: long, text: string, reason: string"
    ).coalesce(1).write.mode("overwrite").parquet(stale)
    assert os.path.isdir(stale)

    pipe = AdmissionPipeline(spark, str(tmp_path / "ledgers"))
    q = SI.admission_sink(
        SI.read_document_stream(spark, src),
        pipe,
        str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ckpt"),
        reject_dir=reject_dir,
    )
    q.awaitTermination()
    # both docs admitted -> zero rejects -> the stale partition is GONE
    assert not os.path.isdir(stale)


def test_run_scoped_key_fallback_warns(tmp_path, caplog):
    """Falling back to the raw batch id reinstates the cross-generation
    collision the scoped key exists to prevent — it must be loud, not
    silent, so operators learn before the ledger guard aborts a stream."""
    from sql_data_warehouse_samples_spark.streaming.ingest import (
        _run_scoped_key,
    )

    with caplog.at_level(logging.WARNING):
        key = _run_scoped_key(str(tmp_path / "no_such_ckpt"), 7)
    assert key == "7"
    assert any("UNSCOPED" in r.message for r in caplog.records)


def test_quarantine_readmission_round_trip(spark, tmp_path):
    """The governance loop the r7 round's two features imply, end to end:
    the map-only streaming gate QUARANTINES maybe-contaminated docs
    (annotate mode — over-drop included, by design one-sided), the exact
    batch d23 adjudication clears the false positives, and the cleared
    docs RE-ADMIT through the ledger path — after which they are real
    corpus members (an exact dup of a re-admitted doc is rejected) while
    the truly contaminated doc stays out."""
    from sql_data_warehouse_samples_spark.operators.dedup import (
        BloomGramFilter,
    )
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI
    from pyspark.sql import functions as F

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [
            (1, " ".join(f"tok{i}" for i in range(40))),
            (2, f"prefix text {bench_gram} suffix text here"),
            (3, " ".join(f"word{i}" for i in range(40))),
        ],
        "doc_id: long, text: string",
    )
    # a deliberately under-sized Bloom: deterministic over-drop (1 bit/gram
    # flags all three docs; only doc 2 truly shares a benchmark 8-gram)
    tiny = BloomGramFilter(bench, bits_per_gram=1)
    annotated = SI.contamination_gate(batch, bloom=tiny, mode="annotate")
    quarantine = annotated.filter(F.col("contaminated_maybe")).drop(
        "contaminated_maybe"
    )
    clean = annotated.filter(~F.col("contaminated_maybe")).drop(
        "contaminated_maybe"
    )
    assert {r.doc_id for r in quarantine.collect()} == {1, 2, 3}

    pipe = AdmissionPipeline(spark, str(tmp_path / "ledgers"))
    assert pipe.admit(clean).count() == 0  # everything got quarantined

    # exact adjudication (the d23 battery over the quarantine): a
    # properly-sized Bloom + string-verify — one true positive
    exact = BloomGramFilter(bench)
    truly = {
        r.doc_id
        for r in exact.contaminated_ids(quarantine, verify=True).collect()
    }
    assert truly == {2}

    # re-admission of the cleared docs through the ledger path
    cleared = quarantine.filter(~F.col("doc_id").isin(list(truly)))
    readmitted = {r.doc_id for r in pipe.admit(cleared).collect()}
    assert readmitted == {1, 3}

    # closure: the re-admitted docs are REAL corpus members now — an exact
    # dup (new id, same text) is rejected by the content ledger, and a
    # near-dup by the signature ledger
    dup = spark.createDataFrame(
        [
            (11, " ".join(f"tok{i}" for i in range(40))),  # exact dup of 1
            (13, " ".join(f"word{i}" for i in range(39)) + " wordX"),  # near 3
            (14, " ".join(f"new{i}" for i in range(40))),  # genuinely new
        ],
        "doc_id: long, text: string",
    )
    assert {r.doc_id for r in pipe.admit(dup).collect()} == {14}


def test_bm25_index_matches_scan_time_scorer(spark, tmp_path):
    """The persisted term-bucketed inverted index (Bm25Index) must return
    VALUE-IDENTICAL results to the scan-time batch scorer — same hits,
    same df, same constants feed the same scoring tail — while reading
    only the query terms' buckets (partition-pruned; no corpus scan)."""
    from sql_data_warehouse_samples_spark.operators.bm25 import (
        Bm25Index,
        bm25_topk,
        bm25_topk_batch,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = Bm25Index.build(d, str(tmp_path / "idx"), n_buckets=8)
    queries = spark.createDataFrame(
        [(0, "spark hash join window"), (1, "vector scan filter merge"),
         (2, "stream batch query sort")],
        "query_id: long, query: string",
    )
    got = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    want = sorted(
        tuple(r) for r in bm25_topk_batch(d, queries, k=5).collect()
    )
    assert got == want and len(got) == 15
    # single-query convenience == the scan-time single-query form
    one = sorted(tuple(r) for r in idx.topk("spark hash join window", k=5).collect())
    ref = sorted(
        tuple(r) for r in bm25_topk(d, "spark hash join window", k=5).collect()
    )
    assert one == ref
    # non-default BM25 params are query-time (index stores raw tf/dl/df)
    tuned = sorted(
        tuple(r)
        for r in idx.topk_batch(queries, k=5, k1=1.6, b=0.6).collect()
    )
    tuned_ref = sorted(
        tuple(r)
        for r in bm25_topk_batch(d, queries, k=5, k1=1.6, b=0.6).collect()
    )
    assert tuned == tuned_ref

    with pytest.raises(ValueError, match="terms"):
        idx.topk_batch(
            spark.createDataFrame([(0, "  ")], "query_id: long, query: string")
        )


def test_bm25_index_forget_equals_rebuild(spark, tmp_path):
    """Deletion propagation on the lexical index (the L-g1 contract): after
    forget(doc), searches equal an index REBUILT from the corpus minus the
    doc — postings, doclens, df and the corpus constants all settle."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_samples_spark.operators.bm25 import Bm25Index

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = Bm25Index.build(d, str(tmp_path / "idx"), n_buckets=8)
    queries = spark.createDataFrame(
        [(0, "spark hash join window"), (1, "stream batch query sort")],
        "query_id: long, query: string",
    )
    victim = idx.topk_batch(queries, k=1).collect()[0][1]
    idx.forget(spark.createDataFrame([(victim,)], "doc_id: long"))
    rebuilt = Bm25Index.build(
        d.filter(F.col("doc_id") != victim), str(tmp_path / "idx2"),
        n_buckets=8,
    )
    got = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    want = sorted(
        tuple(r) for r in rebuilt.topk_batch(queries, k=5).collect()
    )
    assert got == want
    assert all(r[1] != victim for r in got)
    assert idx.n_docs == rebuilt.n_docs and idx.avgdl == rebuilt.avgdl
    # a reopened handle sees the settled constants (meta sidecar rewritten)
    reopened = Bm25Index(spark, str(tmp_path / "idx"))
    assert (reopened.n_docs, reopened.avgdl) == (idx.n_docs, idx.avgdl)


def test_bm25_index_incremental_ingest(spark, tmp_path):
    """The index rides the admission pipeline: ingest() adds a batch as
    its own __bk subpartition (batch-sized work, no index rewrite), a
    keyed replay converges via dynamic overwrite, key reuse for different
    content is refused (the ledger contract), and searches over the
    incrementally-built index equal the scan-time scorer over the full
    corpus — term stats (df, n_docs, avgdl) all settle."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_samples_spark.operators.bm25 import (
        Bm25Index,
        bm25_topk_batch,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d1 = d.filter(F.col("doc_id") % 3 != 0)
    d2 = d.filter(F.col("doc_id") % 3 == 0)
    queries = spark.createDataFrame(
        [(0, "spark hash join window"), (1, "vector scan filter merge")],
        "query_id: long, query: string",
    )
    want = sorted(
        tuple(r) for r in bm25_topk_batch(d, queries, k=5).collect()
    )

    idx = Bm25Index.build(d1, str(tmp_path / "idx"), n_buckets=8)
    idx.ingest(d2, idempotency_key="batch-7")
    got = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    assert got == want

    # crash-replay of the same key converges byte-for-byte
    idx.ingest(d2, idempotency_key="batch-7")
    again = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    assert again == want and idx.n_docs == d.count()

    # re-using the key for DIFFERENT content would corrupt term stats
    with pytest.raises(ValueError, match="different batch"):
        idx.ingest(d1.limit(3), idempotency_key="batch-7")

    # un-keyed append (caller-owned at-most-once) reaches the same state
    idx2 = Bm25Index.build(d1, str(tmp_path / "idx2"), n_buckets=8)
    idx2.ingest(d2)
    assert sorted(
        tuple(r) for r in idx2.topk_batch(queries, k=5).collect()
    ) == want

    # deletion propagation still equals a rebuild AFTER incremental ingest
    victim = got[0][1]
    idx.forget(spark.createDataFrame([(victim,)], "doc_id: long"))
    rebuilt = Bm25Index.build(
        d.filter(F.col("doc_id") != victim), str(tmp_path / "idx3"),
        n_buckets=8,
    )
    assert sorted(
        tuple(r) for r in idx.topk_batch(queries, k=5).collect()
    ) == sorted(tuple(r) for r in rebuilt.topk_batch(queries, k=5).collect())


def test_admission_sink_keeps_bm25_index_in_lockstep(spark, tmp_path):
    """The full pipeline a production ingest runs: decontaminate → dedup-
    admit → corpus write → INDEX the survivors, one foreachBatch.  Only
    admitted docs become searchable; the keyed index ingest makes a
    replayed stream converge (no double counting)."""
    from sql_data_warehouse_samples_spark.operators.bm25 import Bm25Index
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI
    from tests.test_streaming import _doc_row, _write_doc_batches

    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, f"eval question {bench_gram} answer choices")],
        "doc_id: long, text: string",
    )
    base = _text("tok")
    near = base.rsplit(" ", 1)[0] + " tokX"
    poisoned = f"prefix text {bench_gram} suffix text here"
    other = _text("alpha")
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_doc_batches(
        spark,
        src,
        [
            [_doc_row(1, base), _doc_row(3, poisoned)],
            [_doc_row(10, near), _doc_row(12, other)],
        ],
        SI.DOC_SCHEMA,
    )
    pipe = AdmissionPipeline(spark, str(tmp_path / "ledgers"))
    idx = Bm25Index.build(
        spark.createDataFrame([], "doc_id: long, text: string"),
        str(tmp_path / "bm25"),
        n_buckets=8,
    )

    def run():
        q = SI.admission_sink(
            SI.read_document_stream(spark, src),
            pipe,
            str(tmp_path / "corpus"),
            checkpoint=str(tmp_path / "ckpt"),
            benchmark=bench,
            bm25_index=idx,
        )
        q.awaitTermination()

    run()
    # admitted: 1 (batch 0) and 12 (batch 1); 3 contaminated, 10 near-dup
    hits = {r.doc_id for r in idx.topk("tok0 alpha0", k=10).collect()}
    assert hits == {1, 12}
    assert idx.n_docs == 2
    # the contaminated doc's distinctive grams are nowhere in the index
    assert idx.topk("epsilon zeta", k=10).count() == 0

    # a replayed stream (fresh checkpoint-less rerun would collide; the
    # SAME checkpoint replays cleanly) converges — no double counting
    run()
    assert idx.n_docs == 2
    assert {r.doc_id for r in idx.topk("tok0 alpha0", k=10).collect()} == {1, 12}


def test_bm25_index_review_fixes(spark, tmp_path):
    """Round-8 self-review regressions on Bm25Index:
    (a) an un-keyed batch name is never reused while live — even after
        forget() drops an earlier batch's partitions (len()-based naming
        would resurrect u<N> and dynamic-overwrite a LIVE batch);
    (b) key reuse with different content but IDENTICAL ids and token
        counts is still refused (the guard compares full postings);
    (c) keys are validated like the ledgers' (reject, don't sanitize);
    (d) a huge query vocabulary takes the broadcast-join path and stays
        value-identical (no unbounded IN-literal)."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_samples_spark.operators.bm25 import (
        Bm25Index,
        bm25_topk_batch,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = spark.createDataFrame(
        [(0, "spark hash join window")], "query_id: long, query: string"
    )

    # (a) unkeyed-name reuse after forget
    idx = Bm25Index.build(d.limit(0), str(tmp_path / "idx"), n_buckets=8)
    b0 = d.filter(F.col("doc_id") % 3 == 0)
    b1 = d.filter(F.col("doc_id") % 3 == 1)
    b2 = d.filter(F.col("doc_id") % 3 == 2)
    idx.ingest(b0)  # u0
    idx.ingest(b1)  # u1
    idx.forget(b0.select("doc_id"))  # u0's partitions vanish
    idx.ingest(b2)  # must NOT be named u1 again
    want = sorted(
        tuple(r)
        for r in bm25_topk_batch(b1.unionByName(b2), queries, k=5).collect()
    )
    got = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    assert got == want  # b1 survived the third ingest intact

    # (b) same ids + same per-doc token counts, different text: refused
    idx2 = Bm25Index.build(d.limit(0), str(tmp_path / "idx2"), n_buckets=8)
    a1 = spark.createDataFrame([(1, "alpha beta")], "doc_id: long, text: string")
    a2 = spark.createDataFrame([(1, "gamma delta")], "doc_id: long, text: string")
    idx2.ingest(a1, idempotency_key="k0")
    with pytest.raises(ValueError, match="different batch"):
        idx2.ingest(a2, idempotency_key="k0")

    # (c) ledger-grade key validation: reject, never sanitize
    with pytest.raises(ValueError, match="idempotency_key"):
        idx2.ingest(a1, idempotency_key="run a:1")

    # (d) broadcast-join term path (forced low literal cap) is identical
    lit = sorted(tuple(r) for r in idx.topk_batch(queries, k=5).collect())
    joined = sorted(
        tuple(r)
        for r in idx.topk_batch(queries, k=5, max_literal_terms=2).collect()
    )
    assert joined == lit


def test_bpe_kernel_cache_refuses_unsafe_dir(tmp_path, monkeypatch):
    """The kernel .so cache is per-user 0700 and ownership-checked — a
    world-writable cache dir (the /tmp planting vector) must disable the
    kernel, not load whatever is there."""
    import os

    from sql_data_warehouse_samples_spark.operators import bpe as B

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
    cache = tmp_path / f"spark_graft_bpe_{os.getuid()}"
    cache.mkdir(mode=0o700)
    os.chmod(cache, 0o777)  # simulate an attacker-writable cache dir
    old = B._CKERNEL
    B._CKERNEL = False  # force a re-probe
    try:
        assert B._load_bpe_ckernel() is None
    finally:
        B._CKERNEL = old
        os.chmod(cache, 0o700)
    # training still works — the seam falls back to pure Python
    assert B.bpe_train_on_dict([("abab", 4)], 2) == B._bpe_train_on_dict_py(
        [("abab", 4)], 2
    )


def test_roc_auc_bucketing_survives_nan_scores(spark):
    """A single NaN score must not poison the equal-width bucketing (NaN
    max -> NaN width -> every score in one bucket -> AUC silently 0.5).
    NaN rows bucket to the top, matching the exact path's NaN-is-largest
    ordering."""
    from sql_data_warehouse_samples_spark.operators.evalmetrics import roc_auc

    rows = [(i / 97.0 + (0.31 if i % 3 == 0 else 0.0), 1 if i % 3 == 0 else 0)
            for i in range(97)]
    rows.append((float("nan"), 0))
    df = spark.createDataFrame(rows, "score: double, label: int")
    exact = roc_auc(df, "score", "label").collect()[0]
    binned = roc_auc(
        df, "score", "label", max_distinct_scores=16
    ).collect()[0]
    assert binned.n_distinct_scores <= 17  # 16 buckets + the NaN group
    assert binned.auc == pytest.approx(exact.auc, abs=0.05)
    assert binned.auc != pytest.approx(0.5, abs=0.01)


def test_mine_hard_negatives_output_is_rank_ordered(spark):
    """The documented contract: rows come back ordered by lex_rank (the
    batch form: by (query_id, lex_rank)) so .collect()[0] IS the hardest
    negative — the window filter alone leaves exchange order."""
    from sql_data_warehouse_samples_spark.operators.retrieval import (
        mine_hard_negatives,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pos = spark.createDataFrame([(0,)], "doc_id: long")
    out = mine_hard_negatives(d, "spark hash join window", pos, k=8).collect()
    assert [r.lex_rank for r in out] == sorted(r.lex_rank for r in out)
    assert out[0].lex_rank == min(r.lex_rank for r in out)


def test_langid_backoff_semantics_and_impl_parity(spark):
    """Back-off cascade: normal text decides at n=3; a text too short for
    any 3-gram decides at n=2; a text matching no profile at either order
    stays NULL with score 0.  Arrow and fold impls agree through the
    cascade (both are compositions of the parity-locked scorer)."""
    from sql_data_warehouse_samples_spark.operators.langid import (
        classify_language_backoff,
        train_char_ngram_profiles,
    )

    train = spark.createDataFrame(
        [
            ("en", "the quick brown fox and the lazy dog then they ran"),
            ("en", "this is the thing that the other thing was then"),
            ("fr", "le renard brun et le chien paresseux puis ils ont"),
            ("fr", "ceci est la chose que la autre chose etait alors"),
        ],
        "lang: string, text: string",
    )
    profiles = {
        n: train_char_ngram_profiles(train, n=n, top_k=100) for n in (3, 2)
    }
    docs = spark.createDataFrame(
        [
            (1, "the quick thing ran then"),  # English, full 3-gram path
            (2, "le"),                        # 2 chars: MUST back off to n=2
            (3, "xq"),                        # no profile gram at either n
        ],
        "doc_id: long, text: string",
    )
    for impl in ("arrow", "fold"):
        rows = {
            r.doc_id: r
            for r in classify_language_backoff(
                docs, profiles, impl=impl
            ).collect()
        }
        assert rows[1].pred_lang == "en" and rows[1].ngram_order == 3
        assert rows[2].pred_lang == "fr" and rows[2].ngram_order == 2
        assert rows[2].lang_score > 0
        assert rows[3].pred_lang is None and rows[3].ngram_order is None
        assert rows[3].lang_score == 0

    with pytest.raises(ValueError, match="empty"):
        classify_language_backoff(docs, {})


def test_bpe_c_kernel_parity_with_python_path():
    """The compiled-kernel seam (cc + ctypes, import-try) must learn the
    IDENTICAL merge sequence as the pure-Python trainer — same argmax
    tie-breaks (count DESC, left/right symbol ASC over UTF-8 bytes), same
    lazy-heap stale discipline — across randomized dicts, shared-string
    merge paths ("a"+"bc" == "ab"+"c"), and min_count edges."""
    import random

    from sql_data_warehouse_samples_spark.operators import bpe as B

    if B._load_bpe_ckernel() is None:
        pytest.skip("no C compiler on this host — python path is the path")

    rng = random.Random(7)
    letters = "abcdef"
    for _ in range(25):
        n = rng.randint(1, 80)
        d: dict[str, int] = {}
        for _ in range(n):
            w = "".join(
                rng.choice(letters) for _ in range(rng.randint(1, 10))
            )
            d[w] = d.get(w, 0) + rng.randint(1, 40)
        wc = list(d.items())
        nm, mc = rng.randint(1, 50), rng.choice([1, 2, 3])
        assert B.bpe_train_on_dict(wc, nm, min_count=mc, kernel="c") == (
            B.bpe_train_on_dict(wc, nm, min_count=mc, kernel="python")
        )
    # shared-string merge paths: "ab"+"c" and "a"+"bc" both yield "abc" —
    # the kernel must intern BY STRING so later counts don't split
    wc2 = [("abc", 10), ("ab", 8), ("bc", 8), ("abcabc", 6)]
    assert B.bpe_train_on_dict(wc2, 12, min_count=1, kernel="c") == (
        B.bpe_train_on_dict(wc2, 12, min_count=1, kernel="python")
    )
    # unicode symbols: UTF-8 byte order == code-point order keeps ties equal
    wc3 = [("héllo", 5), ("héllos", 4), ("héçz", 3), ("zçéh", 3)]
    assert B.bpe_train_on_dict(wc3, 10, min_count=1, kernel="c") == (
        B.bpe_train_on_dict(wc3, 10, min_count=1, kernel="python")
    )
    assert B.bpe_train_on_dict([], 5, kernel="c") == []


def test_bpe_kernel_arg_validation():
    from sql_data_warehouse_samples_spark.operators import bpe as B

    with pytest.raises(ValueError, match="kernel"):
        B.bpe_train_on_dict([("ab", 2)], 2, kernel="rust")


def test_decode_image_stats_any_decode_failure_yields_null(spark):
    """Same contract as image_dhash (fixed in r7): an injected decoder can
    raise TypeError/struct.error on a truncated payload — one corrupt
    image yields a NULL stats row, never a failed 100 TB pass."""
    import struct

    import numpy as np

    from sql_data_warehouse_samples_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)

    def crashy(b: bytes):
        if b == b"\x01typeerr":
            raise TypeError("buffer of wrong kind")
        if b == b"\x02structerr":
            raise struct.error("unpack requires more bytes")
        return mm.default_decoder(b)

    media = spark.createDataFrame(
        [
            (1, mm.encode_ppm(img)),
            (2, b"\x01typeerr"),
            (3, b"\x02structerr"),
        ],
        "media_id: long, payload: binary",
    )
    old = mm._DECODER
    mm.set_decoder(crashy)
    try:
        got = {r.media_id: r for r in mm.decode_image_stats(media).collect()}
    finally:
        mm._DECODER = old
    assert got[1].pix_sum == int(img.astype(np.int64).sum())
    assert got[1].width == 5 and got[1].height == 4
    for mid in (2, 3):
        r = got[mid]
        assert (r.width, r.height, r.pix_sum, r.pix_min, r.pix_max) == (
            None,
        ) * 5
