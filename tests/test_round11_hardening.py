"""Round-10 hardening: the r9 ADVICE regressions (PQ-retrain fanout on
multi-batch ids, unscoped-key prune fallback — the latter locked in
test_round10_hardening's key-shape test) plus this round's new surfaces.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _vec(seed: int, dim: int = 4) -> list:
    """Deterministic unit-ish vector for a doc id (no RNG in tests)."""
    return [float((seed * (j + 3)) % 17) + 0.25 * j for j in range(dim)]


def test_ivfpq_retrain_no_fanout_on_multibatch_ids(spark, tmp_path):
    """r9 ADVICE (medium): an id living under MULTIPLE __bk batches —
    legal via repeated unkeyed or differently-keyed add() — must retrain
    to exactly ONE code row per (id, batch), not d^3 rows (the old
    re-join on neighbor_id alone fanned d source rows to d^2 duplicate
    codes per batch partition, inflating search results)."""
    from sql_data_warehouse_samples_spark.operators.similarity import (
        IvfPqIndex,
    )

    base = spark.createDataFrame(
        [(i, _vec(i, 8)) for i in range(8)],
        "vec_id: long, embedding: array<double>",
    )
    dup = spark.createDataFrame(
        [(50, _vec(50, 8)), (51, _vec(51, 8))],
        "vec_id: long, embedding: array<double>",
    )
    path = str(tmp_path / "pq")
    idx = IvfPqIndex.build(base, path, nlist=2, m=4, k_pq=4)
    # the same ids under THREE different batches (two keyed, one unkeyed)
    idx.add(dup, idempotency_key="ka")
    idx.add(dup, idempotency_key="kb")
    idx.add(dup)

    idx.retrain(spark, base.unionByName(dup), train_iters=1, pq_iters=1)

    lists = spark.read.parquet(f"{path}/lists")
    # exactly one code row per (id, batch) — no duplicates anywhere
    per_pair = lists.groupBy("neighbor_id", "__bk").count()
    assert per_pair.filter("count > 1").count() == 0
    # the multi-batch ids keep exactly their 3 batch rows
    per_id = {
        r["neighbor_id"]: r["n"]
        for r in lists.groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_id[50] == 3 and per_id[51] == 3
    assert all(per_id[i] == 1 for i in range(8))
    # search serves the re-encoded lists (a multi-batch id legitimately
    # holds one row per batch — the fix bounds that at d rows, not d^3)
    q = spark.createDataFrame(
        [(777, _vec(50, 8))], "vec_id: long, embedding: array<double>"
    )
    got = idx.search(q, k=3, nprobe=2).collect()
    assert got and all(r.adc_d2 >= 0.0 for r in got)
    # keyed replay post-retrain converges without re-introducing dups
    idx.add(dup, idempotency_key="ka")
    assert (
        spark.read.parquet(f"{path}/lists")
        .groupBy("neighbor_id", "__bk")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
