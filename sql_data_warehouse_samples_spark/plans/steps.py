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


def _map_name(name: str) -> str:
    for needle, op in _OP_MAP:
        if needle in name:
            return op
    return "Other"


def executed_steps_with_metrics(df: DataFrame) -> list[tuple[str, str, int | None]]:
    """(operation_type, node_name, row_count) from the *executed* plan.

    After an action has run, each physical node carries SQL metrics; the
    ``numOutputRows`` metric is the per-step row_count the reference exposes
    in sys.dm_pdw_request_steps (vw_query_steps.sql:14-19).  Pre-execution
    (or where a node has no such metric) row_count is None.
    """
    root = df._jdf.queryExecution().executedPlan()
    out: list[tuple[str, str, int | None]] = []
    # wrapper nodes that structure the plan but aren't steps
    _WRAPPERS = ("AdaptiveSparkPlan", "WholeStageCodegen", "InputAdapter",
                 "ColumnarToRow", "QueryStage", "ReusedExchange", "Result")

    def walk(node) -> None:
        name = node.nodeName()
        if not any(w in name for w in _WRAPPERS):
            row_count = None
            try:
                metrics = node.metrics()
                if metrics.contains("numOutputRows"):
                    v = metrics.apply("numOutputRows").value()
                    if v >= 0:
                        row_count = v
            except Exception:  # noqa: BLE001 — metric surface varies by node
                pass
            out.append((_map_name(name), name[:200], row_count))
        # AQE wrappers hide their subplan outside `children`:
        # AdaptiveSparkPlanExec → .executedPlan(), *QueryStageExec → .plan()
        try:
            if "AdaptiveSparkPlan" in name:
                walk(node.executedPlan())
                return
            if "QueryStage" in name:
                walk(node.plan())
                return
        except Exception:  # noqa: BLE001
            pass
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(root)
    out.append(("Return", "collect results to client", None))
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the plan — the scale-review metric
    (every Exchange is a DMS shuffle move in reference terms)."""
    return sum(1 for op, _ in plan_steps(df) if op == "ShuffleMove")


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
