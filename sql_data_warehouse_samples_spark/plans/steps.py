"""Physical-plan step extraction (SURVEY §2.10 / §3).

The reference exposes each query as ordered steps with an operation type
(shuffle/broadcast moves, per-node SQL) in ``sys.dm_pdw_request_steps``
(vw_query_steps.sql:14-19).  Spark's executed plan maps onto the same small
vocabulary (SURVEY §7 step 5 recommends keeping it fixed):

  Scan, Filter, Project, HashAggregate, SortAggregate, Join(Broadcast/
  SortMerge/Hash), Exchange(Shuffle) ≈ DMS shuffle move, Broadcast ≈ DMS
  broadcast move, Sort, Window, Limit, Return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OP_MAP = [
    ("FileScan", "Scan"),
    ("Scan parquet", "Scan"),
    ("BroadcastExchange", "BroadcastMove"),
    ("Exchange", "ShuffleMove"),
    ("BroadcastHashJoin", "BroadcastJoin"),
    ("SortMergeJoin", "ShuffleJoin"),
    ("ShuffledHashJoin", "ShuffleJoin"),
    ("BroadcastNestedLoopJoin", "BroadcastJoin"),
    ("HashAggregate", "Aggregate"),
    ("ObjectHashAggregate", "Aggregate"),
    ("SortAggregate", "Aggregate"),
    ("Window", "Window"),
    ("Sort", "Sort"),
    ("Filter", "Filter"),
    ("Project", "Project"),
    ("GlobalLimit", "Limit"),
    ("LocalLimit", "Limit"),
    ("Generate", "Generate"),
    ("Expand", "Expand"),
]


def plan_lines(df: DataFrame) -> list[str]:
    """Raw executed-plan node lines (simple-string mode)."""
    qe = df._jdf.queryExecution()
    return [
        ln.strip().lstrip("+-*( ").rstrip(") ")
        for ln in qe.executedPlan().toString().splitlines()
        if ln.strip()
    ]


def plan_steps(df: DataFrame) -> list[tuple[str, str]]:
    """(operation_type, node_detail) rows in plan order — the
    dm_pdw_request_steps analogue."""
    steps: list[tuple[str, str]] = []
    for ln in plan_lines(df):
        for needle, op in _OP_MAP:
            if needle in ln:
                steps.append((op, ln[:200]))
                break
    steps.append(("Return", "collect results to client"))
    return steps


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the plan — the scale-review metric
    (every Exchange is a DMS shuffle move in reference terms)."""
    return sum(1 for op, _ in plan_steps(df) if op == "ShuffleMove")


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
