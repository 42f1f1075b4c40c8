"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line (the driver keeps only a ~2000-char tail of
stdout — round 6's verbose single line grew to ~4.2 KB and the official
record was lost).  The emission contract is therefore split:

* stdout: ONE compact line — metric / value / per-query seconds at 2 dp /
  sf / sf1 total — length-tested to stay under 1900 chars as the headline
  set grows (tests/test_bench_emission.py).
* ``BENCH_full_r{N}.json`` at the repo root: the verbose payload (per-rep
  raw times, spreads, sf1 section, protocol notes) for round-over-round
  adjudication without a local re-run.

Execution is materialized through the `noop` sink so timing covers the full
plan (scan → shuffle → agg) without driver-collect overhead, matching how a
cluster job would be measured.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Reps per query (min-of-N recorded).  This box shows 2-7x rep-to-rep
#: swings under host steal (PERFORMANCE.md "measurement protocol"); a
#: single-rep record is noise, and the r5 record was polluted by exactly
#: that — a 1.46x "regression" across untouched queries that min-of-reps
#: shows as 1.02x.  The emitted JSON carries per-query min plus the
#: max/min spread so a reader can tell a real regression (stable across
#:  reps) from steal (huge spread).
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Headline set: one per operator family (join-heavy, agg-heavy, window,
# sessionization, dedup, similarity, text) — the queries a warehouse user
# actually runs, not the cheap scalar batteries.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q09_intersect_customers",
    "q18_distribution_skew",
    "q21_count_distinct",
    "q22_nested_aggregation",
    "q25_nation_revenue_rank",
    "q26_latest_orders_per_customer",
    "q37_tumbling_hourly",
    "q39_user_sessions",
    "d01_dedup_exact",
    "d03_minhash_lsh_pairs",
    "d04_simhash_pairs",
    "d05_embedding_neardup",
    "s01_cosine_topk",
    "s04_ivf_topk",
    # t02_quality_score retired from the headline in r10 to keep the
    # compact stdout line under the driver's ~2000-char tail capture as
    # s15 joined: it is a sub-0.2 s map-only projection whose cost story
    # is carried by t05 here and by the t01_t05 battery driver row.
    "t05_repetition_filters",
    "t06_corpus_quantiles",
    "t08_curation_funnel",
    "d09_duplicate_clusters",
    "d12_semantic_dedup",
    "q58_asof_attribution",
    "q59_session_interval_join",
    "q60_scd2_dimension",
    "t13_line_dedup",
    "m01_media_meta",
    # round-4 additions: the remaining heavy locals, tracked round-over-round
    "q57_grouping_sets",
    "t12_bigram_lm_nll",
    "d11_substring_dup_pairs",
    "d14_duplicate_span_removal",
    "s06_pq_codes",
    # round-4 new operators: shuffle-shards, keep-best dedup, BM25 search
    "p02_training_shards",
    "d15_cluster_canonical",
    "s07_bm25_topk",
    "q61_waiting_suppliers",
    "t14_curation_pipeline",
    "t15_token_budget_selection",
    # round-5 new operators
    "s09_knn_join",
    "d21_incremental_neardup_ledger",
    "t16_bpe_pair_counts",
    "m02_pixel_stats",
    # round-6: heavy hitters (exact freqItems+recount, now a driver row).
    # d22 admission-pipeline is deliberately NOT benched: its end-to-end
    # cost story (two ledger ingest cycles) is already tracked by d21,
    # and its driver row is a correctness gate, not a throughput claim.
    "t18_heavy_hitter_tokens",
    # round-6 new operators: PQ+exact-refine retrieval, hybrid RRF (the
    # BM25+ANN fusion end-to-end incl. both retrievers), Bloom-prefiltered
    # decontamination (d07's exact answer behind a broadcast Bloom).
    "s10_pq_refine_topk",
    "s11_hybrid_rrf",
    "d23_bloom_decontamination",
    # m03 image-dhash is deliberately NOT benched (the d22 precedent): it
    # is a correctness gate whose oracle REQUIRES uncapped buckets over a
    # planted mod-140 class corpus — at sf0.1 that is ~36 identical images
    # per class, so the exact pair set is quadratic in class density BY
    # CONSTRUCTION (measured 32 s, all candidate-pair fan-out).  Its
    # production pipeline costs are tracked where they are real: the
    # decode pass via m02, the banded Hamming machinery (with star caps)
    # via d04.
    "t19_c4_line_clean",
    # round-7 new operators: exact ROC-AUC (distinct-score-sized rank
    # window).  p03 is an oracle-gate row (the d22/m03 precedent): it
    # re-runs p01's packing loop on a synthesized restricted instance
    # purely for the exact value check, so its cost story is p01's.
    "s12_hard_negatives",
    "t20_filter_auc",
    # round-8: batched hard-negative mining — one corpus pass for a query
    # TABLE (tracked alongside s12 so the batch-vs-single cost ratio is a
    # standing measurement; 3 queries here vs s12's 1)
    "s13_hard_negatives_batch",
    # round-7 late: corpus-drift scalar (one token aggregate, vocab-sized
    # tail) and trained language-ID (train = one char-gram aggregate +
    # per-lang rank window; classify map-only behind literal-map profiles)
    "d25_corpus_drift",
    "t21_langid_trained",
    # t22 (2+3-gram back-off) is deliberately NOT benched (the d22/p03
    # precedent): it is the same train aggregate + map-only classify as
    # t21 run at two orders — its cost story IS t21's, doubled.
    # round-9: corpus -> token-id export (two map-only Arrow passes with a
    # per-worker word memo; the alphabet aggregate is the only shuffle)
    "t23_token_ids",
    # r9 session 2: the decode half of the serving loop — t23's encode
    # plus one map-only vocab-lookup pass; the delta vs t23 IS the
    # decode throughput
    "t24_decode_roundtrip",
    # round-10: tokenizer fertility (tokens/word — t23's closed form plus
    # one scalar aggregate; the delta vs t23 is the metric's own cost)
    "t25_tokenizer_fertility",
    # round-10: INDEX-BACKED BM25 serving — s07's exact query answered
    # from the persisted term-bucketed index (build cached once per
    # sf_dir under /tmp; min-of-reps measures the warm partition-pruned
    # search, which is the serving cost claim).  Rides the sf10 standing
    # section so the ~|vocab|/n_buckets pruned-read claim is measured at
    # 100x, not just plan-locked.
    "s14_bm25_index_serving",
    # r10 late: the vector-serving twin — s04's exact queries answered
    # from the persisted IVF lists (probed centroid partitions only);
    # same build-once /tmp caching as s14
    "s15_ivf_index_serving",
    # r12: the compressed-serving third of the index triple — s10's exact
    # two-stage retrieval answered from the persisted IVF-PQ code lists
    # (stored m-byte codes; raw vectors touched only for the shortlist)
    "s16_ivfpq_index_serving",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _section_hygiene(spark) -> None:
    """Drop the session state a finished section leaves behind (r12
    protocol change, first effective in the round-12 sf1/sf10 sections):
    57 headline queries × reps accumulate broadcast blocks and cached
    literals whose ContextCleaner reclamation is GC-driven, and the
    pandas-cogrouped paths (s09's gemm grid) are heap-sensitive enough
    that the accumulated state inflated s09-at-sf1 ~2× vs an isolated
    fresh session (adjudicated in PERFORMANCE.md round 12).  Clearing
    the cache and nudging both collectors between sections makes each
    section measure steady state, not the previous section's residue."""
    import gc

    spark.catalog.clearCache()
    gc.collect()  # free PySpark-side broadcast/plan wrappers
    try:
        spark.sparkContext._jvm.System.gc()  # let ContextCleaner reclaim
    except Exception:  # noqa: BLE001 - hygiene must never break the bench
        pass


REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def infer_round(repo_root: str = REPO_ROOT) -> int:
    """Current round number: $SPARK_GRAFT_ROUND, else max(BENCH_r*.json)+1.

    The driver writes ``BENCH_r{N}.json`` AFTER the round, so during round
    N the repo holds records r1..r{N-1} and the inferred value is N.
    """
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    rounds = []
    for p in glob.glob(os.path.join(repo_root, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    return (max(rounds) + 1) if rounds else 1


def build_compact(payload: dict) -> dict:
    """The driver-facing record: everything adjudication needs, nothing
    that grows unboundedly.  Per-query values at 2 dp; spreads, raw reps
    and prose live in the full-payload file named by ``full``."""
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": {k: round(v, 2) for k, v in payload["queries"].items()},
        "sf": payload["sf"],
    }
    sf1 = payload.get("sf1")
    if isinstance(sf1, dict) and "total_sec" in sf1:
        compact["sf1_total"] = sf1["total_sec"]
    if payload.get("full_record"):
        compact["full"] = payload["full_record"]
    return compact


def compact_line(payload: dict) -> str:
    return json.dumps(build_compact(payload), separators=(",", ":"))


def emit(payload: dict, repo_root: str = REPO_ROOT) -> None:
    """Write the verbose payload to BENCH_full_r{N}.json, print the compact
    line LAST so the driver's stdout-tail capture always contains it."""
    round_n = infer_round(repo_root)
    full_name = f"BENCH_full_r{round_n:02d}.json"
    payload["full_record"] = full_name
    try:
        with open(os.path.join(repo_root, full_name), "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:  # never let the record file break the stdout line
        print(f"bench: could not write {full_name}: {e}", file=sys.stderr)
        payload.pop("full_record", None)
    print(compact_line(payload))


# ---------------------------------------------------------------------------
# Secondary sf1 point: at sf0.1 the ~0.3 s per-entry fixed cost (session,
# plan, task dispatch) floors half the headline entries, so plan wins are
# invisible; a 10x corpus makes the multi-second LLM ops measurable and
# gives the ~linear-scaling claim a second data point.  The driver ships no
# sf1 parquet, so it is SYNTHESIZED once (cached in /tmp) from sf0.1:
# 10 copies of documents/embeddings where every copy is made mutually
# DISTINCT — each document token gets a per-copy suffix (so no shingle,
# gram or hash collides across copies) and each embedding gets a per-copy
# deterministic noise vector (cosine across copies ~0.7, below every
# near-dup threshold).  sf1 is therefore 10 independent sf0.1 corpora:
# outputs scale 10x, no cross-copy terms, which is exactly the shape a
# scaling measurement wants.  Disable with SPARK_GRAFT_SF1=0.
# ---------------------------------------------------------------------------

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SF1_COPIES = 10
SF1_OFFSET = 1_000_000  # > any sf0.1 id

#: document/embedding-only multi-second subset (the TPC-H tables are not
#: replicated — re-keying the orders->lineitem FK chain adds nothing to the
#: scaling question the LLM ops answer).
SF1_SUBSET = [
    "d03_minhash_lsh_pairs",
    "d04_simhash_pairs",
    "d09_duplicate_clusters",
    "d11_substring_dup_pairs",
    "d12_semantic_dedup",
    "d14_duplicate_span_removal",
    "d15_cluster_canonical",
    "s04_ivf_topk",
    "s06_pq_codes",
    "t12_bigram_lm_nll",
    "t14_curation_pipeline",
    "t15_token_budget_selection",
    # r5: exact KNN join is quadratic in rows BY DEFINITION (that is what
    # mode="ivf" is for) — tracked here so the quadratic term stays visible
    # and deliberate; t16 is the one-corpus-shuffle BPE primitive.
    "s09_knn_join",
    "t16_bpe_pair_counts",
    # r6: s10's code-sized ADC scan + candidate-only refine should scale
    # ~linear in corpus rows; d23's Bloom prefilter is map-only over grams
    # (the benchmark side is fixed), so ~linear in document bytes.
    "s10_pq_refine_topk",
    "d23_bloom_decontamination",
    # r7: hard-negative mining's corpus cost is the term-filtered BM25
    # pass — ~linear in document bytes; everything downstream is k_raw-
    # bounded, so the sf1 ratio shows the scan term.  d25's token
    # aggregate is corpus-linear with a vocab-sized tail.
    "s12_hard_negatives",
    "d25_corpus_drift",
    # r9 (the r8 verdict's round-boundary ask): the batch miner's linear
    # term (ONE corpus scan for 3 queries — the sf1 ratio vs s12 shows the
    # amortization) and trained language-ID's train-pass term (one
    # char-gram aggregate; classify is map-only).  t22 stays un-benched
    # (the d22/p03 precedent): its cost story IS t21's at two gram orders.
    "s13_hard_negatives_batch",
    "t21_langid_trained",
    # r9 late: token-id export — corpus-linear Arrow segmentation; the
    # sf1 ratio shows the memo amortization (repeated words segment once
    # per worker)
    "t23_token_ids",
    # r9 session 2: encode+decode round trip — the decode term rides the
    # same memo, so the sf1 ratio should track t23's
    "t24_decode_roundtrip",
    # r10 (round-boundary additions per the standing protocol): the
    # fertility scalar rides t23's closed form (ratio should track
    # t23's); the index-backed search's ratio vs the 10x corpus is the
    # serving-scale claim at the first rung (the sf10 section carries
    # the 100x point).  The one-time per-sf-dir index build is paid on
    # the first rep and cached under /tmp; min-of-reps measures the warm
    # partition-pruned search.
    "t25_tokenizer_fertility",
    "s14_bm25_index_serving",
    # r10 late: the vector-serving twin — s04's exact queries answered
    # from the persisted inverted lists (probed-partition reads only);
    # same /tmp build-once caching as s14
    "s15_ivf_index_serving",
    # r12: the IVF-PQ refined-serving third of the triple
    "s16_ivfpq_index_serving",
]


#: The standing 100x subset (SPARK_GRAFT_SF10=1): ops whose ~linear terms
#: are below fixed cost at sf1 — the 100x ratio is the evidence.  s12/s13
#: ride along so the batch-vs-single mining cost is measured at scale.
SF10_SUBSET = [
    "s10_pq_refine_topk",
    "d23_bloom_decontamination",
    "t19_c4_line_clean",
    "s12_hard_negatives",
    "s13_hard_negatives_batch",
    # round-10: the serving-scale evidence — an index-backed search at
    # 100x corpus.  The one-time index build at sf10 is paid on the
    # first flagged run and cached under /tmp; the measured reps are the
    # warm partition-pruned searches, expected strongly sub-linear
    # (~|query vocab|/n_buckets of the postings, corpus never read).
    "s14_bm25_index_serving",
    "s15_ivf_index_serving",
    # r12: the compressed (IVF-PQ) serving path at 100x — code-list scan
    # + shortlist-only raw fetch; the build is paid once and cached
    "s16_ivfpq_index_serving",
]


def ensure_sf1(spark, base_dir: str) -> str:
    """Synthesize the cached sf1 corpus from ``base_dir`` if absent."""
    from pyspark.sql import functions as F

    marker = os.path.join(SF1_DIR, "_SUCCESS_SF1")
    if os.path.exists(marker):
        return SF1_DIR
    os.makedirs(SF1_DIR, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    doc_copies = []
    emb_copies = []
    for i in range(SF1_COPIES):
        if i == 0:
            doc_copies.append(docs)
            emb_copies.append(embs)
            continue
        doc_copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SF1_OFFSET))
            # suffix EVERY token: no word n-gram / shingle / content hash
            # survives across copies
            .withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1c{i}")
            )
            .withColumn("n_chars", F.length("text"))
        )
        emb_copies.append(
            embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * SF1_OFFSET))
            # deterministic per-copy noise, amplitude >> element scale of a
            # unit vector: copies decorrelate (cos ~0.7), stay non-degenerate
            .withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, j) -> "
                    f"cast(x + 0.5 * sin((j + 1) * {i} * 2.3999 + {i}) as float))"
                ),
            )
        )
    out_docs = doc_copies[0]
    for c in doc_copies[1:]:
        out_docs = out_docs.unionByName(c)
    out_embs = emb_copies[0]
    for c in emb_copies[1:]:
        out_embs = out_embs.unionByName(c)
    out_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet")
    )
    out_embs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "embeddings.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return SF1_DIR


def main() -> None:
    workload.load_all()
    spark = build_session(app_name="sdw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest scale factor (excluded from timing):
    # run every headline query once at sf0.001 so whole-stage-codegen
    # compilation and JIT tiering are amortized before the measured sf runs —
    # the steady-state condition of a long-lived warehouse cluster, which is
    # what per-query throughput should reflect (cold-start is a separate,
    # one-off cost).
    for name in HEADLINE:
        materialize(workload.QUERIES[name](spark, "/root/testdata/sf0.001"))

    # The sf0.001 warmup runs few tasks, so it forks only a handful of
    # Python/Arrow UDF workers; the first sf0.1 Arrow query would then pay
    # the one-time fork+import of the remaining ~32-worker pool inside ITS
    # measured time.  Spin the full pool up here — per-session fixed cost,
    # same category as JVM warmup above (workers are reused for the whole
    # session; at cluster scale they live for the executor lifetime).
    try:
        import pandas as _pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf as _pudf

        @_pudf("long")
        def _warm(s):
            return s

        materialize(
            spark.range(0, 6400, 1, 64).select(_warm("id").alias("v"))
        )
    except ImportError:
        pass

    # rep r runs EVERY query once, then rep r+1 — interleaved rounds, not
    # back-to-back reps of one query, so a host-steal burst inflates one
    # ROUND (visible as spread) instead of one query's whole record
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    reps: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(max(1, N_REPS)):
        for name in HEADLINE:
            fn = workload.QUERIES[name]
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            reps[name].append(time.perf_counter() - t0)
    for name, ts in reps.items():
        timings[name] = round(min(ts), 3)
        spread[name] = round(max(ts) / max(min(ts), 1e-9), 2)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "reps": max(1, N_REPS),
        "rep_protocol": "interleaved rounds; per-query MIN recorded; "
        "spread = max/min per query (>2 = host steal, not plan)",
        "spread": spread,
        # per-rep raw times so a future steal adjudication needs no re-run
        "raw": {n: [round(t, 3) for t in ts] for n, ts in reps.items()},
    }

    # secondary sf1 point (never allowed to break the primary line)
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            _section_hygiene(spark)
            sf1_dir = ensure_sf1(spark, SF_DIR)
            sf1_timings: dict[str, float] = {}
            sf1_spread: dict[str, float] = {}
            sf1_errors: dict[str, str] = {}
            sf1_reps: dict[str, list[float]] = {n: [] for n in SF1_SUBSET}
            # UNTIMED warm-up pass at sf1 (the r8→r9 protocol fix): the
            # first pass over a freshly-synthesized corpus pays page-cache
            # warming and shuffle-dir creation that later reps don't —
            # r8's sf1 raws DESCENDED 51→26→19 on one run and sat flat at
            # ~42 on another, a 2.2x same-code divergence.  The primary
            # sf0.1 protocol already excludes warm-up; mirror it so every
            # timed rep measures the steady state.
            for name in SF1_SUBSET:
                try:
                    materialize(workload.QUERIES[name](spark, sf1_dir))
                except Exception as qe:  # noqa: BLE001
                    sf1_errors[name] = str(qe)[:200]
            for _ in range(max(1, N_REPS)):
                for name in SF1_SUBSET:
                    if name in sf1_errors:
                        continue
                    fn = workload.QUERIES[name]
                    t0 = time.perf_counter()
                    try:
                        materialize(fn(spark, sf1_dir))
                        sf1_reps[name].append(time.perf_counter() - t0)
                    except Exception as qe:  # noqa: BLE001
                        sf1_errors[name] = str(qe)[:200]
            for name, ts in sf1_reps.items():
                if ts:
                    sf1_timings[name] = round(min(ts), 3)
                    sf1_spread[name] = round(max(ts) / max(min(ts), 1e-9), 2)
            payload["sf1"] = {
                "queries": sf1_timings,
                "spread": sf1_spread,
                "total_sec": round(sum(sf1_timings.values()), 3),
                "note": "10x synthesized corpus (mutually-distinct copies); "
                "documents/embeddings ops only; min-of-reps like the primary",
                "raw": {
                    n: [round(t, 3) for t in ts]
                    for n, ts in sf1_reps.items()
                    if ts
                },
            }
            if sf1_errors:
                payload["sf1"]["errors"] = sf1_errors
        except Exception as e:  # noqa: BLE001
            payload["sf1"] = {"error": str(e)[:300]}

    # standing 100x point (SPARK_GRAFT_SF10=1): the ops whose linear terms
    # are invisible at sf1 (fixed-cost floored).  Deliberately FLAG-GATED —
    # d23's benchmark side scales with the corpus here, so the section adds
    # ~3-4 min — and the flagless run (the driver's) CARRIES FORWARD the
    # round's previously-recorded sf10 section instead of erasing it, so
    # one flagged run per round keeps the 100x ratios in the full record.
    # Never in the compact stdout line (it stays sf0.1-only).
    if os.environ.get("SPARK_GRAFT_SF10", "0") == "1":
        try:
            _section_hygiene(spark)
            from scripts.scale_probe import ensure_sf10

            sf10_dir = ensure_sf10(spark, SF_DIR)
            sf10_q: dict[str, dict] = {}
            sf10_reps: dict[str, list[float]] = {n: [] for n in SF10_SUBSET}
            for _ in range(2):  # min-of-2: the section is long; spread
                # still flags steal, and primary mins give the ratio base
                for name in SF10_SUBSET:
                    fn = workload.QUERIES[name]
                    t0 = time.perf_counter()
                    materialize(fn(spark, sf10_dir))
                    sf10_reps[name].append(time.perf_counter() - t0)
            for name, ts in sf10_reps.items():
                base = timings.get(name)
                sf10_q[name] = {
                    "sf10_sec": round(min(ts), 2),
                    "spread": round(max(ts) / max(min(ts), 1e-9), 2),
                    "ratio_100x": (
                        round(min(ts) / base, 1) if base else None
                    ),
                    "raw": [round(t, 2) for t in ts],
                }
            payload["sf10"] = {
                "queries": sf10_q,
                "note": "100x synthesized corpus (mutually-distinct "
                "copies); ratio_100x = sf10 min / this run's sf0.1 min",
            }
        except Exception as e:  # noqa: BLE001
            payload["sf10"] = {"error": str(e)[:300]}
    else:
        prev = os.path.join(
            REPO_ROOT, f"BENCH_full_r{infer_round():02d}.json"
        )
        try:
            with open(prev) as f:
                old = json.load(f)
            if isinstance(old.get("sf10"), dict):
                payload["sf10"] = {**old["sf10"], "carried_forward": True}
        except (OSError, ValueError):
            pass

    emit(payload)


if __name__ == "__main__":
    main()
