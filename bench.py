"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is materialized through the `noop` sink so timing covers the full
plan (scan → shuffle → agg) without driver-collect overhead, matching how a
cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
    "t02_quality_score",
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
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = workload.QUERIES[name]
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
