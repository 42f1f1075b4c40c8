"""Driver-heap A/B probe (VERDICT r5 #7): measure a heavy-query subset at
several SPARK_GRAFT_DRIVER_MEM settings and keep the smallest heap that
wins.  The r5 judge observed repeated d05 reps getting SLOWER at 16 GB
than at 1 GB under interpreter-heavy allocation (GC geometry); with d05
escaped to the gemm tile kernel, this re-measures whether the 16 GB
default is still justified.

    python scripts/heap_probe.py              # orchestrates 4g 8g 16g
    python scripts/heap_probe.py --run 8g     # one config (child mode)

Each config runs in a FRESH process/JVM (heap is a launch-time setting);
per-query min-of-3 reps, same protocol as bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: heavy representatives across the engine's cost centers: shuffle-heavy
#: relational, window, dedup (Arrow kernels + CC loop), similarity
#: (gemm + IVF), text (Arrow scoring)
SUBSET = [
    "q01_pricing_summary",
    "q18_distribution_skew",
    "q28_moving_revenue",
    "d04_simhash_pairs",
    "d05_embedding_neardup",
    "d09_duplicate_clusters",
    "d12_semantic_dedup",
    "s04_ivf_topk",
    "s09_knn_join",
    "t12_bigram_lm_nll",
]

N_REPS = 3


def run_one() -> None:
    from sql_data_warehouse_samples_spark import workload
    from sql_data_warehouse_samples_spark.session import build_session

    workload.load_all()
    spark = build_session(app_name="heap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (codegen + Arrow worker pool), excluded from timing — a
    # sibling sf0.001 of the measured dir when present (cheapest possible
    # warm pass), else the measured dir itself
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in SUBSET:
        workload.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    reps: dict[str, list[float]] = {n: [] for n in SUBSET}
    for _ in range(N_REPS):
        for name in SUBSET:
            t0 = time.perf_counter()
            workload.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            reps[name].append(time.perf_counter() - t0)
    out = {n: round(min(ts), 3) for n, ts in reps.items()}
    print(
        json.dumps(
            {
                # label with the EFFECTIVE heap (session.py defaults to 8g) so a
                # bare --run without the env var reports what it measured
                "heap": spark.conf.get("spark.driver.memory"),
                "total_min_sec": round(sum(out.values()), 3),
                "queries": out,
            }
        )
    )


def main() -> None:
    if sys.argv[1:2] == ["--run"]:
        run_one()
        return
    heaps = sys.argv[1:] or ["4g", "8g", "16g"]
    results = []
    for heap in heaps:
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", heap],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            print(
                json.dumps({"heap": heap, "error": proc.stderr[-300:]}),
                flush=True,
            )
    print(json.dumps({"sf_dir": SF_DIR, "heap_ab": results}))


if __name__ == "__main__":
    main()
