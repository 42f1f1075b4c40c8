"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_data_warehouse_samples_spark import workload


def _loaded() -> None:
    workload.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregate battery) on sf0.001."""
    _loaded()
    return workload.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _loaded()
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (where expressible)."""
    _loaded()
    return dict(workload.ORACLES)
