"""T-SQL dialect shims over pyspark.sql.functions (SURVEY.md §2.8, §7 step 7).

Every function the reference's query corpus uses, exposed under its T-SQL
name as a thin Column builder.  All are one-liners over built-in `F.*`
(JVM-side, codegen) — no UDFs.

Reference sites are cited per function; see SURVEY §2.8 for the full map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- null handling -------------------------------------------------------


def isnull(c: Column | str, default) -> Column:
    """ISNULL(x, d) — MemoryGrant.sql:17."""
    return F.coalesce(_c(c), F.lit(default) if not isinstance(default, Column) else default)


def nullif(c: Column | str, value) -> Column:
    """NULLIF(x, v) — ImpactedTables:13."""
    return F.nullif(_c(c), F.lit(value) if not isinstance(value, Column) else value)


# --- strings -------------------------------------------------------------


def quotename(c: Column | str) -> Column:
    """QUOTENAME(x) → [x] — vw_table_sizes.sql:12."""
    return F.concat(F.lit("["), _c(c), F.lit("]"))


def charindex(sub: str, c: Column | str, start: int = 1) -> Column:
    """CHARINDEX(sub, x [, start]) — GenerateLoadScript-V3:155."""
    return F.locate(sub, _c(c), start)


def len_(c: Column | str) -> Column:
    """LEN(x) — GenerateLoadScript-V1.sql:121 (T-SQL LEN ignores trailing
    spaces — reproduced)."""
    return F.length(F.rtrim(_c(c)))


def left(c: Column | str, n: int) -> Column:
    """LEFT(x, n) — white-papers/...md:594."""
    return F.substring(_c(c), 1, n)


def right(c: Column | str, n: int) -> Column:
    """RIGHT(x, n) — white-papers/...md:599."""
    return F.substring(_c(c), -n, n)


def replicate(c: Column | str, n: int) -> Column:
    """REPLICATE(x, n)."""
    return F.repeat(_c(c), n)


def stuff(c: Column | str, start: int, length: int, repl: str) -> Column:
    """STUFF(x, start, len, repl)."""
    col = _c(c)
    return F.concat(
        F.substring(col, 1, start - 1), F.lit(repl), F.expr(f"substring({'' if isinstance(c, Column) else c}, {start + length})")
    ) if isinstance(c, str) else F.concat(
        F.substring(col, 1, start - 1), F.lit(repl), col.substr(F.lit(start + length), F.length(col))
    )


# --- dates ---------------------------------------------------------------

_DATEPART_MAP = {
    "year": F.year, "yy": F.year, "yyyy": F.year,
    "quarter": F.quarter, "qq": F.quarter, "q": F.quarter,
    "month": F.month, "mm": F.month, "m": F.month,
    "day": F.dayofmonth, "dd": F.dayofmonth, "d": F.dayofmonth,
    "dayofyear": F.dayofyear, "dy": F.dayofyear,
    "week": F.weekofyear, "wk": F.weekofyear, "ww": F.weekofyear,
    "weekday": F.dayofweek, "dw": F.dayofweek,
    "hour": F.hour, "hh": F.hour,
    "minute": F.minute, "mi": F.minute, "n": F.minute,
    "second": F.second, "ss": F.second, "s": F.second,
}


def datepart(part: str, c: Column | str) -> Column:
    """DATEPART(part, x) — white-papers/...md:521-531."""
    try:
        fn = _DATEPART_MAP[part.lower()]
    except KeyError:
        raise ValueError(f"unsupported DATEPART part: {part}") from None
    return fn(_c(c))


def dateadd(part: str, n: int, c: Column | str) -> Column:
    """DATEADD(part, n, x) — TableHealthCount.sql:72 `dateadd(day,-7,getdate())`."""
    col = _c(c)
    p = part.lower()
    if p in ("day", "dd", "d"):
        return F.date_add(col, n)
    if p in ("month", "mm", "m"):
        return F.add_months(col, n)
    if p in ("year", "yy", "yyyy"):
        return F.add_months(col, 12 * n)
    if p in ("week", "wk", "ww"):
        return F.date_add(col, 7 * n)
    if p in ("hour", "hh"):
        return (col.cast("timestamp").cast("long") + 3600 * n).cast("timestamp")
    if p in ("minute", "mi", "n"):
        return (col.cast("timestamp").cast("long") + 60 * n).cast("timestamp")
    if p in ("second", "ss", "s"):
        return (col.cast("timestamp").cast("long") + n).cast("timestamp")
    raise ValueError(f"unsupported DATEADD part: {part}")


def datediff(part: str, start: Column | str, end: Column | str) -> Column:
    """DATEDIFF(part, a, b) — vw_query_queue.sql:8 (ms), LatestBackup.sql:6,
    GenerateLoadScript-V1.sql:156 (minutes)."""
    s, e = _c(start), _c(end)
    p = part.lower()
    if p in ("day", "dd", "d"):
        return F.datediff(e, s)
    if p in ("second", "ss", "s"):
        return e.cast("timestamp").cast("long") - s.cast("timestamp").cast("long")
    if p in ("minute", "mi", "n"):
        return (e.cast("timestamp").cast("long") - s.cast("timestamp").cast("long")) / 60
    if p in ("hour", "hh"):
        return (e.cast("timestamp").cast("long") - s.cast("timestamp").cast("long")) / 3600
    if p in ("millisecond", "ms"):
        return (
            e.cast("timestamp").cast("decimal(26,6)") - s.cast("timestamp").cast("decimal(26,6)")
        ) * 1000
    if p in ("month", "mm", "m"):
        return (F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))
    if p in ("year", "yy", "yyyy"):
        return F.year(e) - F.year(s)
    raise ValueError(f"unsupported DATEDIFF part: {part}")


def getdate() -> Column:
    """GETDATE() — vw_table_sizes.sql:8."""
    return F.current_timestamp()


def sysdatetime() -> Column:
    """SYSDATETIME() — white-papers/...md:519."""
    return F.current_timestamp()


def eomonth(c: Column | str) -> Column:
    """EOMONTH(x) — month-end idiom white-papers/...md:532."""
    return F.last_day(_c(c))


# --- conversion ----------------------------------------------------------

_STYLE_FORMATS = {
    101: "MM/dd/yyyy",
    103: "dd/MM/yyyy",
    112: "yyyyMMdd",
    120: "yyyy-MM-dd HH:mm:ss",
    121: "yyyy-MM-dd HH:mm:ss.SSS",
}


def convert(type_name: str, c: Column | str, style: int | None = None) -> Column:
    """CONVERT(type, x [, style]) — ImpactedTables:14; date styles subset."""
    col = _c(c)
    t = type_name.lower()
    if t in ("varchar", "nvarchar", "char", "nchar") and style in _STYLE_FORMATS:
        return F.date_format(col, _STYLE_FORMATS[style])
    return col.cast(_TSQL_TYPE_MAP.get(t, t))


_TSQL_TYPE_MAP = {
    "bigint": "bigint",
    "int": "int",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "bit": "boolean",
    "float": "double",
    "real": "float",
    "money": "decimal(19,4)",
    "smallmoney": "decimal(10,4)",
    "date": "date",
    "datetime": "timestamp",
    "datetime2": "timestamp",
    "smalldatetime": "timestamp",
    "varchar": "string",
    "nvarchar": "string",
    "char": "string",
    "nchar": "string",
    "varbinary": "binary",
    "binary": "binary",
    "uniqueidentifier": "string",
    "decimal": "decimal(18,2)",
    "numeric": "decimal(18,2)",
}


def tsql_type_to_spark(t: str) -> str:
    """Map a T-SQL type name (with optional precision) to a Spark DDL type.

    Handles `decimal(p,s)`, `varchar(n)`, etc. (SURVEY §1.2 table).
    """
    base = t.strip().lower()
    if "(" in base:
        name, args = base.split("(", 1)
        name = name.strip()
        if name in ("decimal", "numeric"):
            return f"decimal({args.rstrip(')')})"
        return _TSQL_TYPE_MAP.get(name, "string")
    return _TSQL_TYPE_MAP.get(base, base)


# --- misc ----------------------------------------------------------------


def iif(cond: Column, a, b) -> Column:
    """IIF(cond, a, b)."""
    return F.when(cond, a).otherwise(b)


def choose(idx: Column | str, *options) -> Column:
    """CHOOSE(i, v1, v2, ...) — 1-based."""
    c = _c(idx)
    expr = F.lit(None)
    for i, opt in enumerate(reversed(options)):
        pos = len(options) - i
        expr = F.when(c == pos, F.lit(opt)).otherwise(expr)
    return expr
