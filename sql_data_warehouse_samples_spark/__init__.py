"""PySpark-native analytics engine with the query and data-processing
capabilities of Microsoft/sql-data-warehouse-samples (Azure SQL DW / Synapse
dedicated pool samples), re-expressed Spark-first.

Layers (SURVEY.md §7):
  * session   — tuned SparkSession factory (MPP-shaped defaults, AQE, Arrow)
  * catalog   — schema/table/view DDL with distribution & layout metadata
  * sources   — CSV loader with the reference's PolyBase/DBLoader semantics
  * workload  — the §2 operator inventory as named, oracle-checked queries
  * operators — dedup / similarity / text-analysis / maintenance operators
  * meta      — DMV-style introspection tables (requests, partition stats, ...)
  * wlm       — workload management (slots, memory-grant model, scale ladder)
  * streaming — Structured Streaming surface over the events table
"""

from .session import build_session, get_or_create

__all__ = ["build_session", "get_or_create"]
__version__ = "0.1.0"
