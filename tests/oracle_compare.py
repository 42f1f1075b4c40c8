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


#: Spark dtype → canonical type family, matched against DuckDB column types.
#: The driver's value hash is type-sensitive (DuckDB SUM(int) → HUGEINT vs
#: Spark BIGINT hash-differ even when values match), so the local comparator
#: must flag family mismatches, not just stringified-value mismatches.
# Integer widths ≤64-bit all serialize as plain ints on both engines, so the
# driver hash treats them alike (q31's Spark INT vs DuckDB BIGINT LENGTH passed
# round 1).  HUGEINT does NOT — it leaves the int64 pandas fast path — hence
# its own canon value.  Same for float32 vs float64 (repr differs).
_SPARK_TO_CANON = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bytes",
}

_DUCK_TO_CANON = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "int128",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "BLOB": "bytes",
}


def _canon_spark_type(dtype: str) -> str:
    dtype = dtype.strip().lower()
    if dtype.startswith("decimal"):
        return "dec" + dtype[len("decimal"):].replace(" ", "")
    if dtype.startswith("array<") and dtype.endswith(">"):
        return _canon_spark_type(dtype[6:-1]) + "[]"
    return _SPARK_TO_CANON.get(dtype, dtype)


def _canon_duck_type(dtype: str) -> str:
    dtype = dtype.strip()
    if dtype.endswith("[]"):
        return _canon_duck_type(dtype[:-2]) + "[]"
    if dtype.upper().startswith("DECIMAL"):
        return "dec" + dtype[len("DECIMAL"):].replace(" ", "")
    return _DUCK_TO_CANON.get(dtype.upper(), dtype.lower())


def compare_types(spark_df, duck_con, sql):
    """Compare Spark result dtypes vs DuckDB result types by column name."""
    problems = []
    s_types = {c: _canon_spark_type(t) for c, t in spark_df.dtypes}
    d_types = {
        r[0]: _canon_duck_type(r[1])
        for r in duck_con.execute(f"DESCRIBE {sql}").fetchall()
    }
    for col in sorted(set(s_types) & set(d_types)):
        if s_types[col] != d_types[col]:
            problems.append(
                f"type mismatch on {col!r}: spark={s_types[col]} duck={d_types[col]}"
            )
    return problems


def compare(spark_df, duck_con, sql, check_types=True):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if check_types:
        problems.extend(compare_types(spark_df, duck_con, sql))
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
