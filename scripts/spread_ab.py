"""Interleaved per-query A/B of the tbl() scan spread (r13).

``workload._util._scan_spread`` reads ``SPARK_GRAFT_SCAN_SPREAD`` at call
time, so flipping the env var INSIDE one session alternates the r11 shape
(spread off) and the r12 shape (spread on) under identical load — the
only A/B this steal-prone host accepts (PERFORMANCE.md measurement
protocol).  Each rep runs every probed query under BOTH settings
back-to-back; min and median over reps decide the per-call-site opt-in.

Usage: python scripts/spread_ab.py [query ...]   (default: the corpus-
CPU candidates from the r12 verdict).  Writes /tmp/spread_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))

DEFAULT = [
    "d03_minhash_lsh_pairs",
    "d04_simhash_pairs",
    "d09_duplicate_clusters",
    "d11_substring_dup_pairs",
    "d12_semantic_dedup",
    "d14_duplicate_span_removal",
    "d15_cluster_canonical",
    "d23_bloom_decontamination",
    "t05_repetition_filters",
    "t08_curation_funnel",
    "t12_bigram_lm_nll",
    "t19_c4_line_clean",
    "t21_langid_trained",
    "s07_bm25_topk",
    "s11_hybrid_rrf",
    "s12_hard_negatives",
    "s13_hard_negatives_batch",
    "m02_pixel_stats",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    workload.load_all()
    spark = build_session(app_name="spread-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup both shapes at sf0.001 (codegen + Python worker pool)
    for setting in ("1", "0"):
        os.environ["SPARK_GRAFT_SCAN_SPREAD"] = setting
        for n in names:
            materialize(workload.QUERIES[n](spark, "/root/testdata/sf0.001"))

    reps: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in names
    }
    for _ in range(N_REPS):
        for n in names:
            for setting, key in (("1", "on"), ("0", "off")):
                os.environ["SPARK_GRAFT_SCAN_SPREAD"] = setting
                spark.sparkContext.setJobDescription(f"{n} spread={key}")
                t0 = time.perf_counter()
                materialize(workload.QUERIES[n](spark, SF_DIR))
                reps[n][key].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {}
    for n in names:
        on, off = sorted(reps[n]["on"]), sorted(reps[n]["off"])
        out[n] = {
            "on_min": round(on[0], 3),
            "on_med": round(on[len(on) // 2], 3),
            "off_min": round(off[0], 3),
            "off_med": round(off[len(off) // 2], 3),
            "keep_spread": on[0] < off[0]
            and on[len(on) // 2] < off[len(off) // 2],
            "raw_on": [round(t, 3) for t in reps[n]["on"]],
            "raw_off": [round(t, 3) for t in reps[n]["off"]],
        }
    with open("/tmp/spread_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    for n, r in out.items():
        print(
            f"{n}: on {r['on_min']}/{r['on_med']}  off {r['off_min']}/"
            f"{r['off_med']}  -> {'SPREAD' if r['keep_spread'] else 'plain'}"
        )


if __name__ == "__main__":
    main()
