"""Per-stage execution metrics from the Spark status REST API.

The reference's step/task DMVs expose Data-Movement-Service byte counters:
``microsoft.vw_query_step_details.sql:24-33`` joins per-step shuffle worker
bytes/rows, ``MemoryConsumption.sql:24-35`` / ``TempdbConsumption.sql:2-7`` /
``query_memory_usage.sql:22-42`` report per-query memory grants and tempdb
spill.  Spark already tracks the exact analogues per stage — shuffle
read/write bytes+records, memory/disk spill, peak execution memory — in the
app status store, served by the public monitoring REST API
(``{uiWebUrl}/api/v1/applications/{appId}/stages``).

Reading the REST surface keeps this pure-Python (no py4j listener callback
server) and uses only the documented public monitoring interface.  When the
UI is disabled (``spark.ui.enabled=false``) every metric degrades to zero
rather than failing — the DMVs stay queryable.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any

#: StageData fields we surface, with the DMV column each feeds.
_FIELDS = {
    "shuffleReadBytes": "shuffle_read_bytes",
    "shuffleReadRecords": "shuffle_read_rows",
    "shuffleWriteBytes": "shuffle_write_bytes",
    "shuffleWriteRecords": "shuffle_write_rows",
    "memoryBytesSpilled": "memory_spill_bytes",
    "diskBytesSpilled": "disk_spill_bytes",
    "peakExecutionMemory": "peak_memory_bytes",
    "inputBytes": "input_bytes",
    "outputBytes": "output_bytes",
    "executorRunTime": "executor_run_ms",
}

EMPTY = {v: 0 for v in _FIELDS.values()}


#: ExecutorSummary fields → node DMV columns (sys.dm_pdw_nodes parity:
#: one Spark executor = one compute node; the driver = the control node).
_EXEC_FIELDS = {
    "rddBlocks": "rdd_blocks",
    "memoryUsed": "memory_used_bytes",
    "diskUsed": "disk_used_bytes",
    "totalCores": "total_cores",
    "maxTasks": "max_tasks",
    "activeTasks": "active_tasks",
    "completedTasks": "completed_tasks",
    "failedTasks": "failed_tasks",
    "totalDuration": "total_task_ms",
    "totalGCTime": "total_gc_ms",
    "totalInputBytes": "input_bytes",
    "totalShuffleRead": "shuffle_read_bytes",
    "totalShuffleWrite": "shuffle_write_bytes",
    "maxMemory": "max_memory_bytes",
}


def executor_metrics(spark) -> list[dict]:
    """One row per executor (+ the driver) from ``/api/v1/.../executors`` —
    feeds the node-level DMV (sys.dm_pdw_nodes / per-node resource usage).
    Empty list when the UI/REST server is off."""
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return []
    url = f"{base}/api/v1/applications/{sc.applicationId}/executors"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            execs: list[dict[str, Any]] = json.load(resp)
    except Exception:  # noqa: BLE001 — metrics must never break a DMV query
        return []
    out = []
    for e in execs:
        row = {
            "node_id": str(e.get("id", "")),
            "node_type": "CONTROL" if e.get("id") == "driver" else "COMPUTE",
            "host_port": str(e.get("hostPort", "")),
            "is_active": bool(e.get("isActive", False)),
        }
        for field, col in _EXEC_FIELDS.items():
            row[col] = int(e.get(field, 0) or 0)
        out.append(row)
    return out


def stage_metrics(spark) -> dict[int, dict[str, int]]:
    """{stage_id: {dmv_column: value}} for every stage attempt the status
    store still holds (latest attempt wins).  Empty dict if the UI/REST
    server is off."""
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return {}
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?details=false"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages: list[dict[str, Any]] = json.load(resp)
    except Exception:  # noqa: BLE001 — metrics must never break a DMV query
        return {}
    out: dict[int, dict[str, int]] = {}
    seen_attempt: dict[int, int] = {}
    for s in stages:
        sid = s.get("stageId")
        att = s.get("attemptId", 0)
        if sid is None or seen_attempt.get(sid, -1) > att:
            continue
        seen_attempt[sid] = att
        out[sid] = {col: int(s.get(field, 0) or 0) for field, col in _FIELDS.items()}
    return out
