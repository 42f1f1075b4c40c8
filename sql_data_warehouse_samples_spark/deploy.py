"""Schema-change deployment: sync target tables to a staged source schema.

Port of ``samples/scripts/deployments`` (AddTableChanges.sql:1-100,
DeployTableChanges.ps1): a "source" schema manifest — (table_name,
column_name, data_type) rows staged from the dev instance — is diffed
against the live catalog; columns present in the source but missing in the
target generate ``ALTER TABLE .. ADD COLUMNS`` statements, executed through
the engine's statement loop (the reference's WHILE + sp_executesql shape).

Excluded-name filtering mirrors AddTableChanges.sql:8-12: backup/temp/
duplicate staging tables never participate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .catalog import Catalog

#: AddTableChanges.sql:8-12 name filters (``%_Backup%``, ``%_BKP%`` ...)
EXCLUDED_NAME_PATTERNS = [
    r".*_backup.*",
    r".*_bkp.*",
    r".*_tmp.*",
    r".*_wduplicates.*",
    r".*source.*",
]


@dataclass
class ColumnDelta:
    table: str
    column: str
    data_type: str


class SchemaSync:
    """Diff a staged source-schema manifest against the live catalog and
    apply additive column changes."""

    def __init__(self, spark: SparkSession, catalog: Catalog) -> None:
        self.spark = spark
        self.catalog = catalog

    @staticmethod
    def _excluded(table_name: str) -> bool:
        low = table_name.lower()
        return any(re.fullmatch(p, low) for p in EXCLUDED_NAME_PATTERNS)

    def diff(
        self, source_columns: list[tuple[str, str, str]], schema: str
    ) -> list[ColumnDelta]:
        """``source_columns`` = (table_name, column_name, spark_type) rows —
        the reference's ``sourceColumns`` staging table.  Returns columns
        missing in the target (the RIGHT OUTER JOIN ... IS NULL of
        AddTableChanges.sql:40-43), table-name filters applied."""
        live: dict[str, set[str]] = {}
        for t in self.spark.catalog.listTables(schema):
            if t.isTemporary or t.tableType == "VIEW" or self._excluded(t.name):
                continue
            cols = self.spark.catalog.listColumns(t.name, schema)
            live[t.name] = {c.name.lower() for c in cols}
        out = []
        for table, col, dtype in source_columns:
            if self._excluded(table) or table not in live:
                continue
            if col.lower() not in live[table]:
                out.append(ColumnDelta(f"{schema}.{table}", col, dtype))
        return out

    def generate_statements(self, deltas: list[ColumnDelta]) -> list[str]:
        """One ALTER per (table, batch of new columns) — the dynamic @SQL of
        AddTableChanges.sql:70-90."""
        by_table: dict[str, list[ColumnDelta]] = {}
        for d in deltas:
            by_table.setdefault(d.table, []).append(d)
        return [
            "ALTER TABLE "
            + ".".join(f"`{p}`" for p in table.split("."))
            + " ADD COLUMNS ("
            + ", ".join(f"`{d.column}` {d.data_type}" for d in ds)
            + ")"
            for table, ds in sorted(by_table.items())
        ]

    def apply(
        self, source_columns: list[tuple[str, str, str]], schema: str, engine
    ) -> list[str]:
        """Diff → generate → execute via Engine.run_script; returns the
        statements that ran (DeployTableChanges.ps1 end-to-end)."""
        stmts = self.generate_statements(self.diff(source_columns, schema))
        engine.run_script(stmts)
        return stmts

    # --- view-definition sync (AddSPChanges.sql:1-23 / DeploySPChanges.ps1
    # / GetCreateStatement_Function_Proc_View.sql) ------------------------
    #
    # The reference exports each module's sys.sql_modules definition from
    # the dev instance and ships a guarded drop+recreate per changed
    # object.  Procedures are a Python API here (D14), so the module class
    # this syncs is VIEWS: the manifest is view_name → SELECT body.

    @staticmethod
    def _norm_sql(sql: str) -> str:
        """Whitespace/case-insensitive definition compare key."""
        return " ".join(sql.split()).rstrip(";").lower()

    def _live_view_text(self, schema: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for t in self.spark.catalog.listTables(schema):
            if t.tableType != "VIEW" or t.isTemporary:
                continue
            for r in self.spark.sql(
                f"DESCRIBE EXTENDED `{schema}`.`{t.name}`"
            ).collect():
                if r["col_name"] == "View Text":
                    out[t.name] = r["data_type"]
                    break
        return out

    def diff_views(
        self, source_views: dict[str, str], schema: str
    ) -> list[tuple[str, str, str]]:
        """(view, body, reason) for every manifest view that is missing
        from the target or whose live definition drifted — the
        sql_modules-definition compare the reference performs by
        regenerating ChangeScripts_SP for every source object."""
        live = self._live_view_text(schema)
        out = []
        for name, body in sorted(source_views.items()):
            if self._excluded(name):
                continue
            if name not in live:
                out.append((name, body, "missing"))
            elif self._norm_sql(live[name]) != self._norm_sql(body):
                out.append((name, body, "changed"))
        return out

    def generate_view_statements(
        self, deltas: list[tuple[str, str, str]], schema: str
    ) -> list[str]:
        """AddSPChanges' @autoDeploy shape — existence-guarded drop, then
        recreate — collapsed to Spark's atomic CREATE OR REPLACE VIEW."""
        return [
            f"CREATE OR REPLACE VIEW `{schema}`.`{name}` AS {body}"
            for name, body, _reason in deltas
        ]

    def apply_views(
        self, source_views: dict[str, str], schema: str, engine
    ) -> list[str]:
        """Diff → generate → execute (DeploySPChanges.ps1 end-to-end for
        the view module class); returns the statements that ran."""
        stmts = self.generate_view_statements(
            self.diff_views(source_views, schema), schema
        )
        engine.run_script(stmts)
        return stmts
