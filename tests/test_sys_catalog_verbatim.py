"""The reference's sqlops monitoring scripts running VERBATIM.

Each test reads the actual file from the reference checkout and feeds the
UNMODIFIED text through ``Engine.tsql`` — proving the raw ``sys.*`` PDW
catalog layer (pdw_catalog.py) + the T-SQL rewriter serve the exact
relations, column names, and join keys the reference scripts use.
"""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def sysengine(spark, tmp_path_factory):
    """Engine with a hash-distributed table, stats, a backup, and request
    history — enough state that every monitoring script has rows to see."""
    from sql_data_warehouse_samples_spark.catalog import hash_layout
    from sql_data_warehouse_samples_spark.engine import Engine

    eng = Engine(spark)
    eng.catalog.create_schema("sysfact")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(5000)
    eng.create_table_as("sysfact.li", li, hash_layout("l_orderkey"))
    eng.stats.create_statistics("sysfact.li", ["l_orderkey", "l_shipdate"])
    eng.ops.backup(["sysfact.li"], str(tmp_path_factory.mktemp("bak")))
    eng.sql("SELECT COUNT(*) AS n FROM sysfact.li", label="warm").collect()
    eng.register_monitoring_views(["sysfact.li"])
    yield eng
    eng.catalog.drop_schema("sysfact", cascade=True)


def _run(eng, relpath: str):
    with open(os.path.join(REF, relpath)) as f:
        return eng.tsql(f.read())


# (script, expected column subset, min rows)
SQLOPS = "sqlops/MonitoringScripts"
SCRIPTS = [
    (f"{SQLOPS}/TempdbConsumption.sql",
     {"pdw_node_id", "Tempdb_Space_Allocated_KB"}, 1),
    (f"{SQLOPS}/SkewDetection.sql", {"distribution_id", "Data_Size_GB"}, 2),
    (f"{SQLOPS}/StorageSize.sql", {"data_space_GB"}, 3),
    (f"{SQLOPS}/TableHealthCount.sql",
     {"Poor_Quality_Segments", "Stale_Stats_7_Days"}, 1),
    (f"{SQLOPS}/MemoryGrant.sql", {"Table_name", "est_mem_grant_MiB"}, 1),
    (f"{SQLOPS}/MemoryConsumption.sql",
     {"pdw_node_id", "Memory_Utilization_Percentage"}, 2),
    (f"{SQLOPS}/UserActivities.sql",
     {"Active_Sessions", "Active_Queries", "Queued_Queries", "Loads"}, 1),
    (f"{SQLOPS}/Documentation.sql", {"Data_Skew", "Github"}, 1),
    (f"{SQLOPS}/LatestBackup.sql",
     {"start_time", "end_time", "progress_percent", "duration_seconds"}, 1),
    (f"{SQLOPS}/Rowgroups.sql",
     {"Memory_Limitation", "Bulkload", "Dictionary_Size"}, 1),
    (f"{SQLOPS}/RowgroupDetails.sql",
     {"logical_table_name", "state_desc", "total_rows", "trim_reason_desc"}, 1),
    ("scripts/monitor/concurrency/queued_queries.sql",
     {"request_id", "state", "queued_sec"}, 0),
    ("scripts/monitor/concurrency/running_queued_queries_slots.sql",
     {"running_queries", "queued_queries_slots"}, 1),
    ("scripts/monitor/transparent_data_encryption/"
     "transparent_data_encryption_status.sql", {"name", "Encrypted"}, 1),
    ("scripts/queries/query_memory_usage.sql",
     {"request_id", "granted_memory_kb", "requested_memory_gap"}, 1),
]


@pytest.mark.parametrize(
    "relpath,cols,min_rows", SCRIPTS, ids=[s[0].rsplit("/", 1)[1] for s in SCRIPTS]
)
def test_reference_script_verbatim(sysengine, relpath, cols, min_rows):
    df = _run(sysengine, relpath)
    assert cols <= set(df.columns)
    assert df.count() >= min_rows


def test_reference_slo_status_first_statement_verbatim(sysengine):
    """slo_status.sql's SELECT runs verbatim (its WHILE poll loop is
    procedural T-SQL — Engine.ops.wait_for_scale is that loop's API)."""
    with open(
        os.path.join(REF, "scripts/monitor/service_level_objective/slo_status.sql")
    ) as f:
        first = f.read().split(";", 1)[0]
    rows = sysengine.tsql(first).collect()
    assert len(rows) == 1
    assert rows[0].Edition == "DataWarehouse"
    assert rows[0].ServiceObject.startswith("DW")


def test_skew_detection_accounts_every_distribution(sysengine):
    """SkewDetection aggregates per-distribution reserved GB; the hash table
    was written with the 60-way layout so all 60 distributions report."""
    rows = _run(sysengine, f"{SQLOPS}/SkewDetection.sql").collect()
    assert rows and len(rows) == len({r.distribution_id for r in rows})
    assert all(r.Data_Size_GB > 0 for r in rows)


def test_sys_catalog_join_spine_consistency(sysengine):
    """The emitted sys.* relations agree on join keys: tables ⋈ mappings ⋈
    nodes_tables ⋈ partition_stats resolves every distribution, and the
    partition-stats row total equals the table's actual count."""
    spark = sysengine.spark
    total = spark.sql(
        """
        SELECT SUM(ps.row_count) AS n
        FROM pdw_sys_tables t
        JOIN pdw_sys_pdw_table_mappings mp ON t.object_id = mp.object_id
        JOIN pdw_sys_pdw_nodes_tables nt ON mp.physical_name = nt.name
        JOIN pdw_sys_dm_pdw_nodes_db_partition_stats ps
          ON nt.object_id = ps.object_id
         AND nt.pdw_node_id = ps.pdw_node_id
         AND nt.distribution_id = ps.distribution_id
        WHERE t.name = 'li'
        """
    ).collect()[0].n
    assert total == spark.table("sysfact.li").count()
    # every nodes_tables row resolves to a node and a distribution
    dangling = spark.sql(
        """
        SELECT COUNT(*) AS n FROM pdw_sys_pdw_nodes_tables nt
        LEFT JOIN pdw_sys_dm_pdw_nodes pn ON nt.pdw_node_id = pn.pdw_node_id
        LEFT JOIN pdw_sys_pdw_distributions di
          ON nt.distribution_id = di.distribution_id
        WHERE pn.pdw_node_id IS NULL OR di.distribution_id IS NULL
        """
    ).collect()[0].n
    assert dangling == 0
