"""Test-table registry: loads the driver's parquet tables and registers views.

Mirrors the reference's star-schema data model (SURVEY §1.1): dims =
region/nation/customer/supplier/part, facts = orders/lineitem, plus the
events stream table and the LLM-pipeline documents/embeddings tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables: the reference REPLICATEs these to every compute node
# (RefreshReplicatedTable.ps1:44, white-papers/...md:50-51).  In Spark that is
# a broadcast join; Catalyst auto-broadcasts under the threshold and our
# layout layer injects broadcast() hints for declared-replicate tables.
REPLICATED_DIMS = {"region", "nation", "supplier", "customer", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from .workload._util import tbl

    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = tbl(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
