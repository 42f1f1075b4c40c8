"""One-off wall-time probe for the serving-corpus maintenance path —
the numbers an operator planning a maintenance window needs
(PERFORMANCE.md carries the table).  Builds a lease-free stack over the
documents/embeddings tables at $SPARK_GRAFT_SF_DIR (default sf0.1),
ingests keyed batches, then times each maintenance step separately:
ledger compaction, BM25 index compaction, IVF compaction, tombstone
prune, corpus-constants refresh (one corpus_maintenance_window call,
per-step timings derived from repeated single-step calls), and
IvfPqIndex.retrain.  Run:  python scripts/maintenance_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from sql_data_warehouse_samples_spark import maintenance as M
    from sql_data_warehouse_samples_spark.operators.bm25 import Bm25Index
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.operators.similarity import (
        IvfIndex,
        IvfPqIndex,
    )

    from sql_data_warehouse_samples_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the tuned factory, not a raw builder: the default-1g local JVM heap
    # OOMed the r11 sf10 probe (500k docs) in the signature-ledger window
    spark = build_session(app_name="maintenance-probe")
    base = tempfile.mkdtemp(prefix="maint_probe_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_docs = docs.count()
    n_vecs = embs.count()
    report = {"sf_dir": sf_dir, "n_docs": n_docs, "n_vecs": n_vecs}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        report[name] = round(time.perf_counter() - t0, 2)
        return out

    # build the serving stack + two keyed ingest batches (the state a
    # maintenance window actually operates on)
    pipe = AdmissionPipeline(spark, f"{base}/ledgers")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    timed("setup_ledger_ingest_2_batches", lambda: (
        pipe.admit(half, idempotency_key="b0").count(),
        pipe.admit(rest, idempotency_key="b1").count(),
    ))
    bm25 = timed("setup_bm25_build", lambda: Bm25Index.build(
        docs, f"{base}/bm25", n_buckets=32
    ))
    timed("setup_bm25_ingest_batch", lambda: bm25.ingest(
        docs.select("doc_id", F.concat(F.lit("x "), "text").alias("text"))
        .withColumn("doc_id", F.col("doc_id") + 10_000_000),
        idempotency_key="b2",
    ))
    ivf = timed("setup_ivf_build", lambda: IvfIndex.build(
        embs, f"{base}/ivf", nlist=64, train_iters=1
    ))
    pq = timed("setup_pq_build", lambda: IvfPqIndex.build(
        embs, f"{base}/pq", nlist=64, m=8, k_pq=16
    ))
    # forgets so the tombstone-prune step has real work
    purge = embs.select("vec_id").limit(200)
    timed("setup_forgets", lambda: (
        bm25.forget(docs.select("doc_id").limit(200)),
        ivf.forget(spark, purge),
        pq.forget(spark, purge),
    ))

    # the window, step by step (the one-call runbook runs these in order)
    timed("window_ledger_compact", lambda: pipe.compact(8))
    timed("window_bm25_compact", lambda: bm25.compact(settled_keys=["b2"]))
    timed("window_ivf_compact", lambda: ivf.compact(spark))
    timed("window_pq_compact", lambda: pq.compact(spark))
    timed("window_tombstone_prune", lambda: [
        idx.prune_tombstones(spark, include_unreplayable=True)
        if not isinstance(idx, Bm25Index)
        else idx.prune_tombstones(include_unreplayable=True)
        for idx in (bm25, ivf, pq)
    ])
    timed("window_one_call_total", lambda: M.corpus_maintenance_window(
        spark, pipe, indexes=(bm25, ivf, pq)
    ))
    # the census-gated window right after a compaction: every surface is
    # at its floor, so this measures the skip path's metadata-only cost
    timed("window_one_call_census_gated", lambda: M.corpus_maintenance_window(
        spark, pipe, indexes=(bm25, ivf, pq),
        skip_compact_below=10_000,
    ))
    # drift remediation (the expensive, threshold-gated step)
    timed("retrain_ivf", lambda: ivf.retrain(spark, train_iters=1))
    timed("retrain_pq_from_corpus", lambda: pq.retrain(
        spark, embs, train_iters=1, pq_iters=0
    ))
    print(json.dumps(report, indent=1))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
