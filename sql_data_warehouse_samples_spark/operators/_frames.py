"""Driver-sized literal DataFrames, Arrow-backed.

``spark.createDataFrame(<python list>)`` produces an RDD-backed plan:
EVERY action on it (a tiny sidecar write, a broadcast collect) runs
Python-worker tasks — measured ~4 s per 1-row parquet write on
local[32] (r11, scripts-level probe; 32 parallelize slices each spin a
worker, and the pool does not stay warm between sparse jobs).  Routing
the same rows through a pandas DataFrame makes createDataFrame use the
Arrow path — the data ships as JVM-side Arrow batches and every action
runs pure-JVM: the identical write drops to ~0.15-0.3 s.

Values are bit-identical either way (python float → float64 → Arrow
double is exact; the schema string pins the Spark-side types), so
oracle-compared results cannot move — only the job shape changes.
"""

from __future__ import annotations

try:  # pragma: no cover - environment probe
    import pandas as _pd
    import pyarrow  # noqa: F401

    _HAS_ARROW = True
except Exception:  # pragma: no cover
    _HAS_ARROW = False


def small_df(spark, rows, schema: str, columns: list[str]):
    """A literal DataFrame from driver-held ``rows`` (list of tuples),
    Arrow-backed when the environment allows (see module docstring).
    ``schema`` is the usual DDL string; ``columns`` names the tuple
    positions for the pandas intermediate.  Empty ``rows`` fall back to
    the plain path (pandas cannot carry the types of an empty frame)."""
    rows = list(rows)
    if _HAS_ARROW and rows:
        return spark.createDataFrame(
            _pd.DataFrame(rows, columns=columns), schema=schema
        )
    return spark.createDataFrame(rows, schema)
