"""BM25 literal-path tf shape A/B (r13, VERDICT item 5).

``_bm25_scores`` reads SPARK_GRAFT_BM25_TF at call time:
  mapside  — r12 distinct×filter HOF (no exchange, interpreted CPU)
  exchange — r11 explode+groupBy (one hits-only exchange, codegen agg)

Interleaved in one session over the literal-vocab consumers (s07, s11,
s12, s13).  Writes /tmp/bm25_tf_ab.json.
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
NAMES = [
    "s07_bm25_topk",
    "s11_hybrid_rrf",
    "s12_hard_negatives",
    "s13_hard_negatives_batch",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    workload.load_all()
    spark = build_session(app_name="bm25-tf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for shape in ("mapside", "exchange"):  # warmup
        os.environ["SPARK_GRAFT_BM25_TF"] = shape
        for n in NAMES:
            materialize(workload.QUERIES[n](spark, "/root/testdata/sf0.001"))
    reps = {n: {"mapside": [], "exchange": []} for n in NAMES}
    for _ in range(N_REPS):
        for n in NAMES:
            for shape in ("mapside", "exchange"):
                os.environ["SPARK_GRAFT_BM25_TF"] = shape
                spark.sparkContext.setJobDescription(f"{n} tf={shape}")
                t0 = time.perf_counter()
                materialize(workload.QUERIES[n](spark, SF_DIR))
                reps[n][shape].append(time.perf_counter() - t0)
    out = {}
    for n in NAMES:
        m, e = sorted(reps[n]["mapside"]), sorted(reps[n]["exchange"])
        out[n] = {
            "mapside_min": round(m[0], 3),
            "mapside_med": round(m[len(m) // 2], 3),
            "exchange_min": round(e[0], 3),
            "exchange_med": round(e[len(e) // 2], 3),
            "raw_mapside": [round(t, 3) for t in reps[n]["mapside"]],
            "raw_exchange": [round(t, 3) for t in reps[n]["exchange"]],
        }
    with open("/tmp/bm25_tf_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    for n, r in out.items():
        print(
            f"{n}: mapside {r['mapside_min']}/{r['mapside_med']}"
            f"  exchange {r['exchange_min']}/{r['exchange_med']}"
        )


if __name__ == "__main__":
    main()
