"""t12 bigram-LM shape A/B (r13, VERDICT item 4).

Two shapes, interleaved in ONE session (same-load protocol), both on
the r13 default UNSPREAD documents read (the spread A/B already showed
the r12 spread was t12's dominant regression):
  r11 — occurrence-side joins (r11 form)
  r12 — per-gram nll on the vocab side (current form)

The r11 form is reconstructed inline from the same building blocks
(text.bigrams + identical decimal tail), so values are identical; this
script only times noop-sink execution.  Writes /tmp/t12_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.operators.text import bigrams  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402
from sql_data_warehouse_samples_spark.workload._util import tbl  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
ALPHA, ROUND_TO = 0.5, 6


def _tail(scored):
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            ROUND_TO,
        ).alias("avg_nll"),
    )


def _shared(df):
    doc_grams = df.select(
        F.col("doc_id"), F.explode(bigrams(F.col("text"))).alias("g")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bc = doc_grams.groupBy("g").agg(F.count(F.lit(1)).alias("cb"))
    uc = bc.groupBy(F.substring_index("g", " ", 1).alias("w1")).agg(
        F.sum("cb").alias("cu")
    )
    vocab = uc.agg(F.count(F.lit(1)).alias("vv"))
    nll = F.round(
        -F.log(
            (F.col("cb") + F.lit(ALPHA))
            / (F.col("cu") + F.lit(ALPHA) * F.col("vv"))
        ),
        ROUND_TO,
    )
    return doc_grams, bc, uc, vocab, nll


def shape_r11(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    doc_grams, bc, uc, vocab, nll = _shared(d)
    scored = (
        doc_grams.join(bc, "g")
        .withColumn("w1", F.substring_index("g", " ", 1))
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll.alias("nll"))
    )
    return _tail(scored)


def shape_r12(spark, sf_dir):
    return workload.QUERIES["t12_bigram_lm_nll"](spark, sf_dir)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    workload.load_all()
    spark = build_session(app_name="t12-ab")
    spark.sparkContext.setLogLevel("ERROR")
    variants = [("r11", shape_r11), ("r12", shape_r12)]
    for _name, fn in variants:  # warmup
        materialize(fn(spark, "/root/testdata/sf0.001"))
    reps: dict[str, list[float]] = {name: [] for name, _f in variants}
    for _ in range(N_REPS):
        for name, fn in variants:
            spark.sparkContext.setJobDescription(f"t12 {name}")
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            reps[name].append(time.perf_counter() - t0)
    out = {
        name: {
            "min": round(min(ts), 3),
            "med": round(sorted(ts)[len(ts) // 2], 3),
            "raw": [round(t, 3) for t in ts],
        }
        for name, ts in reps.items()
    }
    with open("/tmp/t12_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    for name, r in out.items():
        print(f"{name}: min {r['min']}  med {r['med']}  raw {r['raw']}")


if __name__ == "__main__":
    main()
