"""Per-query optimization probe (guide §1): isolate declared queries,
time them through the noop sink (min-of-N, interleaved), and dump
``.explain("formatted")`` snapshots for the plan-evidence record.

Usage:
    python scripts/perf_probe.py --queries d21_incremental_neardup_ledger s13_hard_negatives_batch
    python scripts/perf_probe.py --all-headline --explain-dir plans/r12 --suffix before --no-time
    python scripts/perf_probe.py --queries d03_minhash_lsh_pairs --reps 5

Notes
-----
* Timing methodology matches bench.py exactly (noop sink, sf0.001 warmup
  rep excluded, interleaved rounds, per-query min + spread) so numbers are
  comparable with BENCH_full_r* records.
* ``--explain-dir`` captures the FINAL frame's formatted plan.  Queries
  that run eager internal stages (ledger ingest, localCheckpoint) surface
  only the last frame here — their internal plans are asserted by
  tests/test_plans.py instead.
* Jobs are labelled (``setJobDescription``) so the UI/REST breakdown maps
  back to query names.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    workload.load_all()
    names = list(args.queries)
    if args.all_headline:
        import bench

        names = [n for n in bench.HEADLINE if n not in names] + names
    unknown = [n for n in names if n not in workload.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_session(app_name="sdw-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"explain: {name}")
            df = workload.QUERIES[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(out, "w") as f:
                f.write(plan)
            print(f"wrote {out} ({len(plan)} chars)")

    if args.no_time:
        return

    # warmup (untimed): codegen/JIT + Arrow worker pool, as in bench.py
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        materialize(workload.QUERIES[name](spark, WARM_DIR))

    reps: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(1, args.reps)):
        for name in names:
            spark.sparkContext.setJobDescription(f"probe: {name}")
            fn = workload.QUERIES[name]
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf_dir))
            reps[name].append(time.perf_counter() - t0)

    result = {}
    for name, ts in reps.items():
        result[name] = {
            "min": round(min(ts), 3),
            "spread": round(max(ts) / max(min(ts), 1e-9), 2),
            "raw": [round(t, 3) for t in ts],
        }
        print(
            f"{result[name]['min']:8.3f}s  spread {result[name]['spread']:5.2f}"
            f"  {name}  raw={result[name]['raw']}"
        )
    print(f"total(min): {round(sum(v['min'] for v in result.values()), 3)}s")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
