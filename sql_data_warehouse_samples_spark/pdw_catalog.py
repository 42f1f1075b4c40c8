"""Raw ``sys.*`` PDW catalog layer (SURVEY.md §2.10 depth).

The reference's sqlops monitoring scripts do NOT query friendly views —
they join the raw SQL DW system catalog: ``sys.schemas`` × ``sys.tables``
× ``sys.pdw_table_mappings`` × ``sys.pdw_nodes_tables`` ×
``sys.dm_pdw_nodes_db_partition_stats`` and friends
(samples/sqlops/MonitoringScripts/StorageSize.sql:8-99,
SkewDetection.sql:1-103, TableHealthCount.sql:1-75, MemoryGrant.sql:1-58,
Rowgroups.sql:1-30, RowgroupDetails.sql:1-24, TempdbConsumption.sql:1-7,
MemoryConsumption.sql:23-35, UserActivities.sql:1-31,
scripts/queries/query_memory_usage.sql:22-42).

This module serves those exact relations — PDW column names, PDW join
keys — from Spark-native sources, so the reference scripts run VERBATIM
through ``Engine.tsql``:

* logical catalog (schemas/tables/objects/columns/types/indexes/stats)
  → ``spark.catalog`` listings + the engine's layout/statistics ledgers;
* physical layout (``pdw_table_mappings`` / ``pdw_nodes_tables`` /
  ``pdw_distributions`` / ``dm_pdw_nodes_db_partition_stats`` /
  columnstore rowgroup DMVs) → parquet footers, one file = one
  distribution, exactly the mapping meta.py already uses;
* nodes (``dm_pdw_nodes``, OS performance counters, tempdb session space)
  → the status REST API (metrics.py) with a JVM-Runtime fallback.  On
  ``local[*]`` the single JVM serves both roles, so the node DMV shows the
  driver as the CONTROL node (id 1) and a COMPUTE node (id 2) backed by
  the same process — the same shape a 60-distribution cluster reports.

Identity model: ``object_id``/``schema_id`` are stable CRC32s of the
qualified name (re-registration keeps ids), distributions are numbered by
file index, and every emitted relation agrees on those keys, so the
reference's N-way catalog joins resolve.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession

# Spark type → (system_type_id, T-SQL name, max_length) — the id space the
# reference's MemoryGrant.sql:30-36 string-size CASE tests (167/175/231/239
# are the char/varchar/nchar/nvarchar family).
_SYSTYPES = {
    "string": (231, "nvarchar", 8000),
    "int": (56, "int", 4),
    "bigint": (127, "bigint", 8),
    "smallint": (52, "smallint", 2),
    "tinyint": (48, "tinyint", 1),
    "double": (62, "float", 8),
    "float": (59, "real", 4),
    "decimal": (106, "decimal", 17),
    "date": (40, "date", 3),
    "timestamp": (61, "datetime", 8),
    "timestamp_ntz": (61, "datetime", 8),
    "boolean": (104, "bit", 1),
    "binary": (165, "varbinary", 8000),
    "array": (240, "udt", 8000),
}

#: node ids — CONTROL first, like a PDW appliance map
CONTROL_NODE_ID = 1
_FIRST_COMPUTE_ID = 2


def object_id(qualified: str) -> int:
    """Stable positive object id for a ``schema.table`` name."""
    return zlib.crc32(qualified.encode()) & 0x7FFFFFFF


class PdwSysCatalog:
    """Builds + registers the raw ``sys.*`` relations as temp views
    (``pdw_sys_<name>``); ``functions/rewriter.py`` maps the ``sys.``
    names in verbatim scripts onto them."""

    def __init__(self, engine) -> None:
        self.engine = engine
        self.spark: SparkSession = engine.spark

    # ---- node topology ---------------------------------------------------

    def _nodes(self) -> list[tuple[int, str, str]]:
        """[(pdw_node_id, type, name)] — driver = CONTROL; executors =
        COMPUTE; on local[*] the driver doubles as the only COMPUTE node.
        Cached per ``register()`` pass — every call hits the status REST
        endpoint otherwise (one HTTP round-trip per DMV row is the kind of
        control-plane chatter that melts a 1000-executor driver)."""
        if getattr(self, "_nodes_cache", None) is not None:
            return self._nodes_cache
        from .metrics import executor_metrics

        rows = executor_metrics(self.spark)
        out = [(CONTROL_NODE_ID, "CONTROL", "driver")]
        nid = _FIRST_COMPUTE_ID
        for r in rows:
            if r["node_type"] == "COMPUTE":
                out.append((nid, "COMPUTE", r["host_port"] or r["node_id"]))
                nid += 1
        if len(out) == 1:  # local[*]: the driver is also the compute fleet
            out.append((_FIRST_COMPUTE_ID, "COMPUTE", "localhost"))
        self._nodes_cache = out
        return out

    def _compute_ids(self) -> list[int]:
        return [nid for nid, typ, _ in self._nodes() if typ == "COMPUTE"]

    # ---- logical catalog -------------------------------------------------

    def _catalog_rows(self):
        """One pass over spark.catalog: (schemas, tables, views, columns)."""
        schemas, tables, views, columns = {}, [], [], []
        for db in self.spark.catalog.listDatabases():
            schemas[db.name] = zlib.crc32(db.name.encode()) & 0xFFFFF
            for t in self.spark.catalog.listTables(db.name):
                if t.isTemporary:
                    continue
                oid = object_id(f"{db.name}.{t.name}")
                (views if t.tableType == "VIEW" else tables).append(
                    (t.name, oid, schemas[db.name])
                )
                try:
                    cols = self.spark.catalog.listColumns(t.name, db.name)
                except Exception:  # noqa: BLE001 — unresolvable view
                    continue
                for i, c in enumerate(cols):
                    base = re.match(r"\w+", c.dataType or "string").group(0)
                    tid, _name, maxlen = _SYSTYPES.get(base, (231, "nvarchar", 8000))
                    columns.append(
                        (oid, i + 1, c.name, tid, tid, maxlen, bool(c.nullable))
                    )
        return schemas, tables, views, columns

    def register(self, tables: list[str] | None = None) -> None:
        """Register every raw relation as a ``pdw_sys_*`` temp view.

        ``tables`` limits the physical (parquet-footer) relations, exactly
        like ``Meta.register_views`` — the logical catalog is always full.
        """
        self._nodes_cache = None  # refresh node topology once per register
        schemas, tbls, views, cols = self._catalog_rows()
        self._df(
            [(name, sid) for name, sid in schemas.items()],
            "name string, schema_id long",
        ).createOrReplaceTempView("pdw_sys_schemas")
        from pyspark.sql import types as T

        name_of = {sid: name for name, sid in schemas.items()}
        # SCHEMA_NAME(schema_id) (clean.sql:5 existence guards)
        self.spark.udf.register(
            "SCHEMA_NAME", lambda sid: name_of.get(sid), T.StringType()
        )
        self._df(
            [(n, o, s, "U", "USER_TABLE") for n, o, s in tbls],
            "name string, object_id long, schema_id long, type string,"
            " type_desc string",
        ).createOrReplaceTempView("pdw_sys_tables")
        self._df(
            [(n, o, s, "U", "USER_TABLE") for n, o, s in tbls]
            + [(n, o, s, "V", "VIEW") for n, o, s in views],
            "name string, object_id long, schema_id long, type string,"
            " type_desc string",
        ).createOrReplaceTempView("pdw_sys_objects")
        self._df(
            cols,
            "object_id long, column_id int, name string, system_type_id int,"
            " user_type_id int, max_length int, is_nullable boolean",
        ).createOrReplaceTempView("pdw_sys_columns")
        self._df(
            sorted({(tid, tid, name) for tid, name, _len in _SYSTYPES.values()}),
            "user_type_id int, system_type_id int, name string",
        ).createOrReplaceTempView("pdw_sys_types")
        self._register_layout(tbls, set(tables) if tables else None)
        self._register_stats(cols)
        self._register_physical(tables or [])
        self._register_runtime()

    def _df(self, rows, schema) -> DataFrame:
        if not rows:
            n = len(schema.split(","))
            return self.spark.createDataFrame([(None,) * n], schema).limit(0)
        return self.spark.createDataFrame(rows, schema)

    # ---- physical layout (distribution metadata) -------------------------

    def _register_layout(self, tbls, monitored: set[str] | None = None) -> None:
        """indexes / distribution properties / column distribution ordinal /
        table mappings — from the engine catalog's declared layouts
        (StorageSize.sql:76-97's join spine).

        ``monitored`` bounds the control-plane cost: the sys.partitions
        row-belief needs a DESCRIBE EXTENDED per table (a driver
        round-trip), so the catalog-statistics lookup runs only for the
        monitored set; every other table answers from the in-memory stats
        ledger (or the 1000-row missing-stats sentinel) — the same numbers
        ImpactedTables' drift check consumes, without O(all tables) RPCs
        on every register() of a wide catalog."""
        indexes, dist_props, col_dist, mappings, partitions = [], [], [], [], []
        sch_of = {}
        for db in self.spark.catalog.listDatabases():
            for t in self.spark.catalog.listTables(db.name):
                if not t.isTemporary and t.tableType != "VIEW":
                    sch_of[object_id(f"{db.name}.{t.name}")] = db.name
        self._index_id = {}  # object_id → index_id, shared with partition DMV
        for name, oid, _sid in tbls:
            qual = f"{sch_of.get(oid, 'default')}.{name}"
            try:
                layout = self.engine.catalog.get_layout(qual)
            except Exception:  # noqa: BLE001 — external/unmanaged table
                layout = None
            index_type = (layout.index_type if layout else None) or "CCI"
            itype, idesc = {
                "CCI": (5, "CLUSTERED COLUMNSTORE"),
                "heap": (0, "HEAP"),
            }.get(index_type, (1, "CLUSTERED"))
            indexes.append((oid, 1 if itype else 0, itype, idesc))
            self._index_id[oid] = 1 if itype else 0
            # sys.partitions: the CONTROL node's row-count belief comes from
            # optimizer statistics, so a never-analyzed table reports the
            # PDW default estimate of 1000 rows — exactly the sentinel
            # ImpactedTables:6 tests (@missingStatCtlRowCount int=1000)
            ctl_rows = None
            if monitored is None or qual in monitored:
                try:
                    from .maintenance import catalog_row_estimate

                    ctl_rows = catalog_row_estimate(self.spark, qual)
                except Exception:  # noqa: BLE001
                    pass
            if ctl_rows is None:
                ctl_rows = self.engine.stats.last_analyzed_rows(qual)
            partitions.append(
                (oid, self._index_id[oid], 1,
                 1000 if ctl_rows is None else int(ctl_rows))
            )
            policy = (layout.distribution if layout else None) or "round_robin"
            pdesc = {"hash": "HASH", "replicate": "REPLICATE"}.get(
                policy, "ROUND_ROBIN"
            )
            dist_props.append((oid, {"HASH": 2, "REPLICATE": 3}.get(pdesc, 4), pdesc))
            mappings.append((oid, f"Table_{oid}"))
            if layout and layout.distribution_column:
                try:
                    for i, f in enumerate(self.spark.table(qual).schema.fields):
                        if f.name == layout.distribution_column:
                            col_dist.append((oid, i + 1, 1))
                except Exception:  # noqa: BLE001
                    pass
        self._df(
            indexes, "object_id long, index_id int, type int, type_desc string"
        ).createOrReplaceTempView("pdw_sys_indexes")
        self._df(
            dist_props,
            "object_id long, distribution_policy int,"
            " distribution_policy_desc string",
        ).createOrReplaceTempView("pdw_sys_pdw_table_distribution_properties")
        self._df(
            col_dist, "object_id long, column_id int, distribution_ordinal int"
        ).createOrReplaceTempView("pdw_sys_pdw_column_distribution_properties")
        self._df(
            mappings, "object_id long, physical_name string"
        ).createOrReplaceTempView("pdw_sys_pdw_table_mappings")
        self._df(
            partitions,
            "object_id long, index_id int, partition_number int, rows long",
        ).createOrReplaceTempView("pdw_sys_partitions")

    def _register_stats(self, cols) -> None:
        """sys.stats / sys.stats_columns + the STATS_DATE() lookup — from the
        StatisticsService ledger (TableHealthCount.sql:55-75's staleness
        count)."""
        import datetime as dt

        col_id = {(oid, name): cid for oid, cid, name, *_ in cols}
        stats, stats_cols, dates = [], [], {}
        per_table: dict[str, int] = {}
        for e in self.engine.stats._ledger:
            oid = object_id(e["table"])
            for c in e["columns"]:
                sid = per_table.get(e["table"], 0) + 1
                per_table[e["table"]] = sid
                stats.append((oid, sid, f"stat_{c}", 1))
                cid = col_id.get((oid, c))
                if cid is not None:
                    stats_cols.append((oid, sid, cid))
                dates[(oid, sid)] = dt.datetime.fromtimestamp(e["analyzed_at"])
        self._df(
            stats, "object_id long, stats_id int, name string, user_created int"
        ).createOrReplaceTempView("pdw_sys_stats")
        self._df(
            stats_cols, "object_id long, stats_id int, column_id int"
        ).createOrReplaceTempView("pdw_sys_stats_columns")
        from pyspark.sql import types as T

        self.spark.udf.register(
            "STATS_DATE",
            lambda oid, sid: dates.get((oid, sid)),
            T.TimestampType(),
        )

    # ---- physical stats (parquet footers) --------------------------------

    def _register_physical(self, tables: list[str]) -> None:
        """Per-distribution partition stats + columnstore rowgroup DMVs.
        One parquet file = one distribution (meta.py's mapping); pages are
        8 KB like the reference's ``* 8.0`` KB math (StorageSize.sql:28)."""
        compute = self._compute_ids()
        nodes_tables, pstats, rowgroups = [], [], []
        for qual in tables:
            oid = object_id(qual)
            stats = self.engine.meta.partition_stats(qual).collect()
            dist_of_file = {}
            for r in stats:
                node = compute[r.distribution_id % len(compute)]
                dist_of_file[r.file_path] = (r.distribution_id, node)
                nodes_tables.append((f"Table_{oid}", oid, node, r.distribution_id))
                reserved = -(-r.used_bytes // 8192)
                data = -(-r.data_bytes // 8192)
                pstats.append(
                    (oid, node, r.distribution_id,
                     getattr(self, "_index_id", {}).get(oid, 1), 1,
                     reserved, reserved, data, 0, 0, r.row_count)
                )
            for g in self.engine.meta.rowgroups(qual).collect():
                dist, node = dist_of_file.get(g.file_path, (0, compute[0]))
                rowgroups.append(
                    (oid, node, dist, 1, g.row_group_id, 3, g.state_desc,
                     g.total_rows, 0, g.size_in_bytes, g.trim_reason_desc,
                     "NOT_APPLICABLE", False, None, None, 1)
                )
        self._df(
            nodes_tables,
            "name string, object_id long, pdw_node_id int, distribution_id int",
        ).createOrReplaceTempView("pdw_sys_pdw_nodes_tables")
        self._df(
            pstats,
            "object_id long, pdw_node_id int, distribution_id int,"
            " index_id int, partition_number int, reserved_page_count long,"
            " used_page_count long, in_row_data_page_count long,"
            " row_overflow_used_page_count long, lob_used_page_count long,"
            " row_count long",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_nodes_db_partition_stats")
        rg_schema = (
            "object_id long, pdw_node_id int, distribution_id int,"
            " partition_number int, row_group_id int, state int,"
            " state_desc string, total_rows long, deleted_rows long,"
            " size_in_bytes long, trim_reason_desc string,"
            " transition_to_compressed_state_desc string,"
            " has_vertipaq_optimization boolean, created_time timestamp,"
            " closed_time timestamp, generation int"
        )
        df = self._df(rowgroups, rg_schema)
        df.createOrReplaceTempView("pdw_sys_pdw_nodes_column_store_row_groups")
        # the physical-stats DMV carries the same rows + delta-store id
        # (RowgroupDetails.sql:6-16)
        df.selectExpr("*", "CAST(NULL AS LONG) AS delta_store_hobt_id")\
            .createOrReplaceTempView(
                "pdw_sys_dm_pdw_nodes_db_column_store_row_group_physical_stats"
            )
        dists = sorted({d for _n, _o, _nid, d in nodes_tables})
        self._df(
            [
                (d, compute[d % len(compute)], f"Distribution_{d + 1}", d + 1)
                for d in dists
            ],
            "distribution_id int, pdw_node_id int, name string, position int",
        ).createOrReplaceTempView("pdw_sys_pdw_distributions")

    # ---- runtime DMVs (nodes, memory, tempdb, waits, loads, backups) -----

    def _jvm_memory(self) -> tuple[int, int]:
        """(committed_bytes, max_bytes) of this JVM — the perf-counter
        fallback when the status REST server is off."""
        rt = self.spark._jvm.java.lang.Runtime.getRuntime()
        return int(rt.totalMemory()), int(rt.maxMemory())

    def _register_runtime(self) -> None:
        import datetime as dt

        from .metrics import executor_metrics

        nodes = self._nodes()
        self._df(
            [(nid, typ, name, name, False) for nid, typ, name in nodes],
            "pdw_node_id int, type string, name string, address string,"
            " is_passive boolean",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_nodes")

        # OS performance counters (MemoryConsumption.sql:23-35): current and
        # target server memory per node, in KB
        execs = {
            r["host_port"]: r
            for r in executor_metrics(self.spark)
            if r["node_type"] == "COMPUTE"
        }
        committed, maxmem = self._jvm_memory()
        counters = []
        for nid, _typ, name in nodes:
            e = execs.get(name)
            used = (e["memory_used_bytes"] or committed) if e else committed
            total = (e["max_memory_bytes"] or maxmem) if e else maxmem
            counters += [
                (nid, "SQLServer:Memory Manager",
                 "Total Server Memory (KB)", used // 1024),
                (nid, "SQLServer:Memory Manager",
                 "Target Server Memory (KB)", total // 1024),
            ]
        self._df(
            counters,
            "pdw_node_id int, object_name string, counter_name string,"
            " cntr_value long",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_nodes_os_performance_counters")

        # tempdb session space (TempdbConsumption.sql:2-7): spill bytes are
        # our tempdb allocation; database_id 2 IS tempdb (DB_NAME() UDF)
        from .metrics import stage_metrics

        disk = mem = 0
        for m in stage_metrics(self.spark).values():
            disk += m["disk_spill_bytes"]
            mem += m["memory_spill_bytes"]
        sid = self.engine._session["session_id"]
        space = [
            (sid, 2, self._compute_ids()[0], disk // 8192, mem // 8192)
        ]
        self._df(
            space,
            "session_id string, database_id int, pdw_node_id int,"
            " user_objects_alloc_page_count long,"
            " internal_objects_alloc_page_count long",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_nodes_db_session_space_usage")

        # waits (UserActivities.sql:16-22): admission-control queue states
        waits = [
            (i, sid, rid, "UserConcurrencyResourceType",
             "AcquireResources" if state == "Queued" else "Granted")
            for i, (rid, _rc, state, _sec, slots) in enumerate(
                self.engine.wlm.waits_log()
            )
            if slots >= 0
        ]
        self._df(
            waits,
            "wait_id int, session_id string, request_id string, type string,"
            " state string",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_waits")

        # DMS external work (UserActivities.sql:25-29): one row per external
        # (CSV) load the engine ran
        loads = [
            (e.get("request_id", ""), 0, "FILE SPLIT", e["path"])
            for e in self.engine._load_log
        ]
        self._df(
            loads,
            "request_id string, step_index int, type string, input_name string",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_dms_external_work")

        # per-distribution SQL requests + memory grants
        # (query_memory_usage.sql:24-42: pr ⋈ psqlr on request_id,
        #  psqlr.spid ⋈ mem.session_id)
        from .wlm import TOTAL_SLOTS

        _, maxmem = self._jvm_memory()
        slot_kb = maxmem // TOTAL_SLOTS // 1024
        grants, sqlreqs = [], []
        for r in self.engine._requests:
            spid = object_id(r.request_id) % 100000
            sqlreqs.append(
                (r.request_id, 0, self._compute_ids()[0], -1, r.status, None,
                 dt.datetime.fromtimestamp(r.start_time or r.submit_time),
                 dt.datetime.fromtimestamp(r.end_time) if r.end_time else None,
                 r.total_elapsed_ms, None, spid, r.command)
            )
            if r.resource_class:
                # grant = the class's slot share of executor memory — the
                # reference's slots-to-memory model (M2/M3, wlm.py)
                grant_kb = self.engine.wlm.slots_for(r.resource_class) * slot_kb
                grants.append(
                    (self._compute_ids()[0], spid, grant_kb, grant_kb, grant_kb)
                )
        self._df(
            sqlreqs,
            "request_id string, step_index int, pdw_node_id int,"
            " distribution_id int, status string, error_id string,"
            " start_time timestamp, end_time timestamp,"
            " total_elapsed_time long, row_count long, spid int,"
            " command string",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_sql_requests")
        self._df(
            grants,
            "pdw_node_id int, session_id int, requested_memory_kb long,"
            " granted_memory_kb long, ideal_memory_kb long",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_nodes_exec_query_memory_grants")

        # DMS workers (vw_query_step_details.sql:24-33): our data-movement
        # worker = a shuffle stage; bytes/rows from the status REST API
        dms = []
        for row in self.engine.task_requests().collect():
            moved = row.shuffle_read_bytes + row.shuffle_write_bytes
            rows_moved = row.shuffle_read_rows + row.shuffle_write_rows
            elapsed = max(row.executor_run_ms, 1)
            dms.append(
                (row.request_id, 0, row.stage_id, "Complete",
                 moved * 1000 // elapsed, moved, rows_moved, elapsed)
            )
        self._df(
            dms,
            "request_id string, step_index int, dms_step_index int,"
            " status string, bytes_per_sec long, bytes_processed long,"
            " rows_processed long, total_elapsed_time long",
        ).createOrReplaceTempView("pdw_sys_dm_pdw_dms_workers")

        # principals + role membership (vw_security_role_members.sql:8-16)
        roles = sorted({r for r, _m in self.engine._role_members})
        members = sorted({m for _r, m in self.engine._role_members})
        pid = {name: i + 1 for i, name in enumerate(roles + members)}
        self._df(
            [(pid[r], r, "DATABASE_ROLE") for r in roles]
            + [(pid[m], m, "SQL_USER") for m in members],
            "principal_id int, name string, type_desc string",
        ).createOrReplaceTempView("pdw_sys_database_principals")
        self._df(
            [(pid[r], pid[m]) for r, m in self.engine._role_members],
            "role_principal_id int, member_principal_id int",
        ).createOrReplaceTempView("pdw_sys_database_role_members")

        # object-class catalog slices (clean.sql:4-13 existence guards)
        self.spark.sql(
            "SELECT name, object_id, schema_id FROM pdw_sys_objects"
            " WHERE type = 'V'"
        ).createOrReplaceTempView("pdw_sys_views")
        self._df(
            [], "name string, object_id long, schema_id long"
        ).createOrReplaceTempView("pdw_sys_procedures")

        # loader backup runs (LatestBackup.sql:2-10)
        self.engine.ops.backup_runs().selectExpr(
            "run_id", "start_time", "end_time",
            "progress_percent AS progress", "status",
        ).createOrReplaceTempView("pdw_sys_pdw_loader_backup_runs")

        # databases / SLO / operation status / TDE
        # (slo_status.sql:4-15, transparent_data_encryption_status.sql:1-10)
        dbs = sorted(
            {d.name for d in self.spark.catalog.listDatabases()}
            | {self.engine.ops.database_name}
            | set(self.engine.ops._encrypted)
        )
        self._df(
            [
                (name, i + 3,
                 1 if self.engine.ops._encrypted.get(name, False) else 0)
                for i, name in enumerate(dbs)
            ],
            "name string, database_id int, is_encrypted int",
        ).createOrReplaceTempView("pdw_sys_databases")
        self._df(
            [
                (dbs.index(self.engine.ops.database_name) + 3, "DataWarehouse",
                 f"DW{self.engine.ops.ladder.current}c")
            ],
            "database_id int, edition string, service_objective string",
        ).createOrReplaceTempView("pdw_sys_database_service_objectives")
        self.engine.ops.operation_status().selectExpr(
            "operation", "resource_type_desc", "detail", "start_time",
            "end_time", "state_desc",
        ).createOrReplaceTempView("pdw_sys_dm_operation_status")


# ---------------------------------------------------------------------------
# Azure Data Studio dashboard manifest (samples/sqlops/package.json) — the
# reference's packaging of the MonitoringScripts as insight widgets.
# ---------------------------------------------------------------------------


def dashboard_manifest(package_json_path: str) -> list[dict]:
    """Parse the sqlops extension manifest into insight rows:
    ``{insight_id, widget_name, script, chart_type, grid}``.

    The manifest's ``dashboard.insights`` name each widget's query file
    (``./sql/X.sql`` → ``MonitoringScripts/X.sql``; the one name variance
    is TableHealth → TableHealthCount) and chart form; ``dashboard.tabs``
    carries the display name + grid placement.  Everything the widgets
    query already runs verbatim through the engine
    (tests/test_sys_catalog_verbatim.py) — this closes the last sqlops
    asset by wiring manifest → script → engine."""
    import json
    import os

    with open(package_json_path) as f:
        pkg = json.load(f)
    contrib = pkg.get("contributes", {})
    names: dict[str, tuple[str, dict]] = {}
    for tab in contrib.get("dashboard.tabs", []):
        for w in tab.get("container", {}).get("widgets-container", []):
            widget = w.get("widget", {})
            for iid in widget:
                names[iid] = (w.get("name", iid), w.get("gridItemConfig", {}))
    aliases = {"TableHealth.sql": "TableHealthCount.sql"}
    out = []
    for ins in contrib.get("dashboard.insights", []):
        qf = os.path.basename(ins["contrib"]["queryFile"])
        script = aliases.get(qf, qf)
        name, grid = names.get(ins["id"], (ins["id"], {}))
        out.append(
            {
                "insight_id": ins["id"],
                "widget_name": name,
                "script": f"MonitoringScripts/{script}",
                "chart_type": next(iter(ins["contrib"]["type"])),
                "grid": grid,
            }
        )
    return out


def run_dashboard(engine, sqlops_dir: str) -> dict[str, "object"]:
    """Execute every manifest widget's script verbatim through the
    engine; returns {insight_id: DataFrame} — the data each dashboard
    chart would render."""
    import os

    out = {}
    for ins in dashboard_manifest(os.path.join(sqlops_dir, "package.json")):
        path = os.path.join(sqlops_dir, ins["script"])
        with open(path) as f:
            out[ins["insight_id"]] = engine.tsql(f.read())
    return out
