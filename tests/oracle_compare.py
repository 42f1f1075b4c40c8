"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

Compares row count + column names + order-insensitive values, normalizing
types the way an order-insensitive value hash would see them (sort columns
by name, sort rows, stringify cell values canonically).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, colnames):
    """Sort columns by name, then rows; return canonical tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [colnames[i] for i in order], out


def compare(spark_df, duck_con, sql):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    sc, sn = normalize(s_rows, s_cols)
    _, dn = normalize(d_rows, d_cols)
    if sn != dn:
        n_bad = 0
        for a, b in zip(sn, dn):
            if a != b:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value mismatch (cols {sc}):\n  spark={a}\n  duck ={b}")
        if n_bad:
            problems.append(f"total mismatched rows: {n_bad}/{len(sn)}")
        elif len(sn) != len(dn):
            pass
    return problems
