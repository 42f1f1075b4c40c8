"""Query workload registry.

Every operator family from SURVEY.md §2 is exercised by at least one named
query here.  Each query has:

* a PySpark implementation ``(spark, sf_dir) -> DataFrame`` — the engine path;
* (usually) an ANSI-SQL oracle string DuckDB runs on the same parquet —
  the correctness gate (driver compares row count + schema + value hash).

Cross-engine determinism conventions (SURVEY §7 risk register):

* SUM/AVG over ``double`` columns is order-dependent in IEEE float math, so
  both sides aggregate via exact DECIMAL: ``CAST(SUM(CAST(x AS DECIMAL(18,4)))
  AS DOUBLE)``.  Decimal addition is associative → identical bits.
* Variance/stddev and transcendental outputs are rounded to 6 dp on both
  sides.
* Every computed column is aliased identically on both sides.
* Top-k queries order with a unique tiebreaker so the selected set is
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all workload modules so their queries register."""
    from . import relational  # noqa: F401
    from . import windows  # noqa: F401
    from . import scalar_functions  # noqa: F401
    from . import events  # noqa: F401
    from . import llm_text  # noqa: F401
    from . import llm_similarity  # noqa: F401
    from . import multimodal  # noqa: F401
