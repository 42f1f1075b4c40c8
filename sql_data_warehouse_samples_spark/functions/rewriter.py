"""Light T-SQL → Spark SQL text rewriter (SURVEY §7 step 7).

Lets the reference's monitoring corpus run nearly verbatim against the
engine's meta views.  Deliberately regex-light — full T-SQL parsing is out
of scope; the rewriter covers the dialect gap the corpus actually uses:

* ``[bracket identifiers]``       → backtick identifiers
* ``SELECT TOP n``                → trailing ``LIMIT n``
* ``ISNULL(x, d)``                → ``COALESCE(x, d)``
* ``COUNT_BIG(*)``                → ``COUNT(*)``  (already 64-bit)
* ``GETDATE()/SYSDATETIME()``     → ``current_timestamp()``
* ``DATEDIFF(part, a, b)``        → ``timestampdiff(PART, a, b)``
* ``DATEADD(part, n, d)``         → ``timestampadd(PART, n, d)``
* ``CONVERT(type, x)``            → ``CAST(x AS type)`` (style args dropped)
* ``sys.dm_pdw_* / sys.tables...``→ the engine's ``meta_*`` views
* ``OPTION (LABEL = '...')``      → stripped; returned as the request label

String literals are never rewritten (the text is split on quoted spans
first).  Known non-goals: ``+`` string concat (type-dependent), correlated
``OBJECT_ID()`` guards, procedural T-SQL — use the Python API for those.
"""

from __future__ import annotations

import re

# T-SQL datepart aliases → ANSI interval units (white-papers/...md:521-531)
_DATEPARTS = {
    "year": "YEAR", "yy": "YEAR", "yyyy": "YEAR",
    "quarter": "QUARTER", "qq": "QUARTER", "q": "QUARTER",
    "month": "MONTH", "mm": "MONTH", "m": "MONTH",
    "week": "WEEK", "wk": "WEEK", "ww": "WEEK",
    "day": "DAY", "dd": "DAY", "d": "DAY",
    "hour": "HOUR", "hh": "HOUR",
    "minute": "MINUTE", "mi": "MINUTE", "n": "MINUTE",
    "second": "SECOND", "ss": "SECOND", "s": "SECOND",
    "millisecond": "MILLISECOND", "ms": "MILLISECOND",
    "microsecond": "MICROSECOND", "mcs": "MICROSECOND",
}

# DMV / catalog view names → our meta views (SURVEY §2.10)
_RELATION_MAP = {
    "sys.dm_pdw_exec_requests": "meta_requests",
    "sys.dm_pdw_request_steps": "meta_request_steps",
    "sys.dm_pdw_resource_waits": "meta_resource_waits",
    "sys.dm_pdw_sql_requests": "vw_sql_requests",
    "sys.tables": "meta_tables",
    "sys.columns": "meta_columns",
    "sys.dm_pdw_nodes_db_partition_stats": "meta_partition_stats",
    "sys.pdw_nodes_column_store_row_groups": "meta_rowgroups",
    "sys.database_role_members": "meta_role_members",
}

_TSQL_TYPES = {
    "datetime": "TIMESTAMP", "datetime2": "TIMESTAMP",
    "smalldatetime": "TIMESTAMP", "date": "DATE",
    "varchar": "STRING", "nvarchar": "STRING", "char": "STRING",
    "nchar": "STRING", "sysname": "STRING",
    "bit": "BOOLEAN", "tinyint": "TINYINT", "smallint": "SMALLINT",
    "int": "INT", "bigint": "BIGINT", "float": "DOUBLE", "real": "FLOAT",
    "money": "DECIMAL(19,4)", "smallmoney": "DECIMAL(10,4)",
}

_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """[(is_literal, span)] partition of the statement."""
    out, pos = [], 0
    for m in _LITERAL_RE.finditer(sql):
        if m.start() > pos:
            out.append((False, sql[pos : m.start()]))
        out.append((True, m.group()))
        pos = m.end()
    if pos < len(sql):
        out.append((False, sql[pos:]))
    return out


def _rewrite_segment(seg: str) -> str:
    s = seg
    s = re.sub(r"\[([^\]\[]+)\]", r"`\1`", s)
    s = re.sub(r"\bISNULL\s*\(", "COALESCE(", s, flags=re.I)
    s = re.sub(r"\bCOUNT_BIG\s*\(", "COUNT(", s, flags=re.I)
    s = re.sub(r"\b(?:GETDATE|SYSDATETIME|SYSUTCDATETIME)\s*\(\s*\)",
               "current_timestamp()", s, flags=re.I)

    def datefn(m: re.Match) -> str:
        fn, part = m.group(1).lower(), m.group(2).lower()
        unit = _DATEPARTS.get(part, part.upper())
        return f"timestamp{'diff' if fn == 'datediff' else 'add'}({unit},"

    s = re.sub(r"\b(DATEDIFF|DATEADD)\s*\(\s*(\w+)\s*,", datefn, s, flags=re.I)

    def datepart(m: re.Match) -> str:
        unit = _DATEPARTS.get(m.group(1).lower(), m.group(1).upper())
        return f"extract({unit} FROM "

    s = re.sub(r"\bDATEPART\s*\(\s*(\w+)\s*,", datepart, s, flags=re.I)

    def convert(m: re.Match) -> str:
        t = m.group(1).lower()
        base = re.match(r"(\w+)", t).group(1)
        mapped = _TSQL_TYPES.get(base)
        if mapped is None:  # decimal(p,s) etc. pass through
            mapped = t.upper()
        elif "(" in t and base not in ("varchar", "nvarchar", "char", "nchar"):
            mapped = t.upper().replace(base.upper(), mapped, 1)
        return f"CAST({m.group(2).strip()} AS {mapped})"

    s = re.sub(
        r"\bCONVERT\s*\(\s*(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*,"
        r"\s*([^(),]+(?:\([^()]*\))?[^(),]*)\s*(?:,\s*\d+\s*)?\)",
        convert, s, flags=re.I,
    )
    for tsql_name, ours in _RELATION_MAP.items():
        s = re.sub(re.escape(tsql_name) + r"\b", ours, s, flags=re.I)
    return s


def rewrite_tsql(sql: str) -> tuple[str, str | None]:
    """Rewrite one T-SQL statement → (spark_sql, label_or_None)."""
    label = None
    m = re.search(r"\bOPTION\s*\(\s*LABEL\s*=\s*'((?:[^']|'')*)'\s*\)", sql, re.I)
    if m:
        label = m.group(1).replace("''", "'")
        sql = sql[: m.start()] + sql[m.end() :]

    parts = [(lit, seg if lit else _rewrite_segment(seg))
             for lit, seg in _split_literals(sql)]
    out = "".join(seg for _, seg in parts)

    tops = re.findall(r"\bSELECT\s+(?:DISTINCT\s+)?TOP\s+(\d+)\b", out, re.I)
    if len(tops) > 1:
        raise ValueError("TOP in subqueries is not supported by the rewriter")
    if tops:
        out = re.sub(r"(\bSELECT\s+(?:DISTINCT\s+)?)TOP\s+\d+\s+", r"\1", out,
                     flags=re.I)
        out = out.rstrip().rstrip(";") + f" LIMIT {tops[0]}"
    return out.strip(), label
