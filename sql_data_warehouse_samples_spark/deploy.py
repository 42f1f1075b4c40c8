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
