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

* ``QUOTENAME(x)``                → ``concat('[', x, ']')``
* ``AS 'alias'``                  → ``AS `alias``` (TempdbConsumption.sql:4)
* ``[alias] = expr`` select item  → ``expr AS alias`` (queued_queries.sql:5)
* ``'lit' + x`` / ``x + 'lit'``   → ``||`` (literal-adjacent ``+`` only —
  a ``+`` with no string-literal neighbor stays numeric addition)
* ``IF OBJECT_ID('..') IS NOT NULL DROP TABLE t`` → ``DROP TABLE IF EXISTS``
* ``TOP n`` in subqueries         → ``LIMIT n`` at the subquery's close
  (paren-depth scan, literal-aware)

* ``DECLARE @x type = literal;``  → constant inlined at every ``@x`` use
  (ImpactedTables:5-8 threshold block; ``decimal`` w/o precision keeps
  T-SQL's (18,0) truncation)

String literals are never rewritten (the text is split on quoted spans
first).  Known non-goals: procedural T-SQL (WHILE/SET @x/cursors) — use
the Python API / ``Engine.run_script`` for those.
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

# DMV / catalog view names → our meta views (SURVEY §2.10).  The raw
# ``sys.*`` catalog relations (pdw_sys_*) come from pdw_catalog.py; the
# engine-log DMVs (meta_*) from engine.py.  Replacement iterates
# longest-name-first so prefix pairs (sys.stats / sys.stats_columns)
# can't mis-resolve.
_RELATION_MAP = {
    "sys.dm_pdw_exec_requests": "meta_requests",
    "sys.dm_pdw_request_steps": "meta_request_steps",
    "sys.dm_pdw_resource_waits": "meta_resource_waits",
    "sys.dm_pdw_exec_sessions": "meta_sessions",
    "sys.database_role_members": "pdw_sys_database_role_members",
    # raw PDW catalog (pdw_catalog.py)
    "sys.schemas": "pdw_sys_schemas",
    "sys.tables": "pdw_sys_tables",
    "sys.objects": "pdw_sys_objects",
    "sys.columns": "pdw_sys_columns",
    "sys.types": "pdw_sys_types",
    "sys.indexes": "pdw_sys_indexes",
    "sys.partitions": "pdw_sys_partitions",
    "sys.stats": "pdw_sys_stats",
    "sys.stats_columns": "pdw_sys_stats_columns",
    "sys.pdw_table_distribution_properties":
        "pdw_sys_pdw_table_distribution_properties",
    "sys.pdw_column_distribution_properties":
        "pdw_sys_pdw_column_distribution_properties",
    "sys.pdw_table_mappings": "pdw_sys_pdw_table_mappings",
    "sys.pdw_nodes_tables": "pdw_sys_pdw_nodes_tables",
    "sys.pdw_distributions": "pdw_sys_pdw_distributions",
    "sys.dm_pdw_nodes": "pdw_sys_dm_pdw_nodes",
    "sys.dm_pdw_nodes_db_partition_stats":
        "pdw_sys_dm_pdw_nodes_db_partition_stats",
    "sys.pdw_nodes_column_store_row_groups":
        "pdw_sys_pdw_nodes_column_store_row_groups",
    "sys.dm_pdw_nodes_db_column_store_row_group_physical_stats":
        "pdw_sys_dm_pdw_nodes_db_column_store_row_group_physical_stats",
    "sys.dm_pdw_nodes_os_performance_counters":
        "pdw_sys_dm_pdw_nodes_os_performance_counters",
    "sys.dm_pdw_nodes_db_session_space_usage":
        "pdw_sys_dm_pdw_nodes_db_session_space_usage",
    "sys.dm_pdw_waits": "pdw_sys_dm_pdw_waits",
    "sys.dm_pdw_dms_external_work": "pdw_sys_dm_pdw_dms_external_work",
    "sys.dm_pdw_dms_workers": "pdw_sys_dm_pdw_dms_workers",
    "sys.database_principals": "pdw_sys_database_principals",
    "sys.views": "pdw_sys_views",
    "sys.procedures": "pdw_sys_procedures",
    "sys.dm_pdw_nodes_exec_query_memory_grants":
        "pdw_sys_dm_pdw_nodes_exec_query_memory_grants",
    "sys.dm_pdw_sql_requests": "pdw_sys_dm_pdw_sql_requests",
    "sys.pdw_loader_backup_runs": "pdw_sys_pdw_loader_backup_runs",
    "sys.databases": "pdw_sys_databases",
    "sys.database_service_objectives": "pdw_sys_database_service_objectives",
    "sys.dm_operation_status": "pdw_sys_dm_operation_status",
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
    # normalize bracketed catalog references ([sys].[dm_pdw_x]) so the
    # relation map below matches the sqlops scripts verbatim
    s = re.sub(r"\[sys\]\s*\.\s*\[(\w+)\]", r"sys.\1", s, flags=re.I)
    s = re.sub(r"\bsys\s*\.\s*\[(\w+)\]", r"sys.\1", s, flags=re.I)
    # the monitoring solution deploys into a 'microsoft' schema
    # (schema/microsoft.sql:4); its views land here as schema-flattened
    # temp views (microsoft.vw_x → microsoft_vw_x)
    s = re.sub(r"\[microsoft\]\s*\.\s*\[(\w+)\]", r"microsoft_\1", s, flags=re.I)
    s = re.sub(r"\bmicrosoft\s*\.\s*\[?(\w+)\]?", r"microsoft_\1", s, flags=re.I)
    s = re.sub(r"\[([^\]\[]+)\]", r"`\1`", s)
    # QUOTENAME(x) → concat('[', x, ']') — vw_table_sizes.sql:12 idiom.
    # Single-level parens in the argument are tolerated.
    s = re.sub(
        r"\bQUOTENAME\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"concat('[', \1, ']')",
        s,
        flags=re.I,
    )
    s = re.sub(r"\bISNULL\s*\(", "COALESCE(", s, flags=re.I)
    s = re.sub(r"\bCOUNT_BIG\s*\(", "COUNT(", s, flags=re.I)
    s = re.sub(r"\b(?:GETDATE|SYSDATETIME|SYSUTCDATETIME)\s*\(\s*\)",
               "current_timestamp()", s, flags=re.I)
    s = re.sub(r"\bDB_NAME\s*\(\s*\)", "current_database()", s, flags=re.I)
    s = re.sub(r"\b(?:SUSER_SNAME|USER_NAME|CURRENT_USER)\s*\(\s*\)",
               "current_user()", s, flags=re.I)
    s = re.sub(r"\bNEWID\s*\(\s*\)", "uuid()", s, flags=re.I)

    def datefn(m: re.Match) -> str:
        fn, part = m.group(1).lower(), m.group(2).lower()
        unit = _DATEPARTS.get(part, part.upper())
        return f"timestamp{'diff' if fn == 'datediff' else 'add'}({unit},"

    s = re.sub(r"\b(DATEDIFF|DATEADD)\s*\(\s*(\w+)\s*,", datefn, s, flags=re.I)

    def datepart(m: re.Match) -> str:
        unit = _DATEPARTS.get(m.group(1).lower(), m.group(1).upper())
        return f"extract({unit} FROM "

    s = re.sub(r"\bDATEPART\s*\(\s*(\w+)\s*,", datepart, s, flags=re.I)

    s = _rewrite_converts(s)
    for tsql_name in sorted(_RELATION_MAP, key=len, reverse=True):
        s = re.sub(re.escape(tsql_name) + r"\b", _RELATION_MAP[tsql_name],
                   s, flags=re.I)
    return s


def _rewrite_converts(s: str) -> str:
    """``CONVERT(type, expr[, style])`` → ``CAST(expr AS type)`` with a
    paren-depth scan, so arbitrarily nested expressions work
    (ImpactedTables:24 ``convert(decimal(10,2), ((max(x)-min(x))*100.0 /
    nullif(sum(x),0)))``).  Runs per non-literal segment — a CONVERT whose
    argument spans a string literal is out of corpus scope."""
    while True:
        m = re.search(
            r"\bCONVERT\s*\(\s*(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*,",
            s, flags=re.I,
        )
        if m is None:
            return s
        depth = 0
        end = None
        for i in range(m.end(), len(s)):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
        if end is None:  # unbalanced — leave untouched
            return s
        arg = s[m.end():end].strip()
        # optional trailing style argument: a depth-0 comma + bare integer
        d = 0
        for j in range(len(arg) - 1, -1, -1):
            ch = arg[j]
            if ch == ")":
                d += 1
            elif ch == "(":
                d -= 1
            elif ch == "," and d == 0:
                if re.fullmatch(r"\s*\d+\s*", arg[j + 1:]):
                    arg = arg[:j].rstrip()
                break
        t = m.group(1).lower()
        base = re.match(r"(\w+)", t).group(1)
        mapped = _TSQL_TYPES.get(base)
        if mapped is None:  # decimal(p,s) etc. pass through
            mapped = re.sub(r"\s+", "", t).upper()
        elif "(" in t and base not in ("varchar", "nvarchar", "char", "nchar"):
            mapped = re.sub(r"\s+", "", t).upper().replace(base.upper(), mapped, 1)
        s = s[: m.start()] + f"CAST({arg} AS {mapped})" + s[end + 1:]


def _inline_declares(sql: str) -> str:
    """``DECLARE @name type = literal;`` constants → inlined values
    (ImpactedTables:5-8's threshold block).  T-SQL ``decimal`` with no
    precision spec defaults to (18,0), so those values are cast — the
    reference's ``@minSkewPercent decimal=10.0`` really compares against
    10, and the inlined form preserves that truncation.  Procedural
    variables (SET/SELECT @x=, WHILE) remain out of scope (module doc)."""
    decls: dict[str, str] = {}

    def grab(m: re.Match) -> str:
        name, typ, val = m.group(1), m.group(2), m.group(3).strip().rstrip(";")
        base = re.match(r"(\w+)", typ).group(1).lower()
        if base in ("decimal", "numeric"):
            prec = re.search(r"\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)", typ)
            p, sc = (prec.group(1), prec.group(2) or "0") if prec else ("18", "0")
            val = f"CAST({val} AS DECIMAL({p},{sc}))"
        decls[name] = val
        return ""

    sql = re.sub(
        r"(?im)^\s*DECLARE\s+@(\w+)\s+"
        r"(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*=\s*"
        r"('(?:[^']|'')*'|[^;\n]+);?\s*$",
        grab,
        sql,
    )
    if not decls:
        return sql
    # substitute outside string literals only — '@name' inside a literal
    # is content, not a variable reference
    parts = []
    for lit, seg in _split_literals(sql):
        if not lit:
            for name in sorted(decls, key=len, reverse=True):
                seg = re.sub(r"@" + re.escape(name) + r"\b", decls[name], seg)
        parts.append(seg)
    return "".join(parts)


def _strip_nprefix(sql: str) -> str:
    """Drop the ``N`` of ``N'...'`` unicode-literal prefixes: an N directly
    before a literal-start quote, itself outside any literal and not part
    of a longer identifier (``COLUMN'x'`` stays untouched)."""
    drop = set()
    for m in _LITERAL_RE.finditer(sql):
        p = m.start()
        if (
            p >= 1
            and sql[p - 1] in "Nn"
            and (p == 1 or not (sql[p - 2].isalnum() or sql[p - 2] == "_"))
        ):
            drop.add(p - 1)
    if not drop:
        return sql
    return "".join(ch for i, ch in enumerate(sql) if i not in drop)


def _concat_plus(parts: list[tuple[bool, str]]) -> list[tuple[bool, str]]:
    """Rewrite literal-adjacent ``+`` to ``||`` (T-SQL string concat,
    GenerateLoadScript-V3:144-155 / vw_table_sizes.sql:12 ``a + '.' + b``).
    A ``+`` with no string-literal neighbor is left as numeric addition."""
    out = list(parts)
    for i, (lit, seg) in enumerate(out):
        if lit:
            continue
        if i > 0 and out[i - 1][0]:  # previous span is a literal
            seg = re.sub(r"^(\s*)\+", r"\1||", seg)
        if i + 1 < len(out) and out[i + 1][0]:  # next span is a literal
            seg = re.sub(r"\+(\s*)$", r"||\1", seg)
        out[i] = (lit, seg)
    return out


def _rewrite_tops(out: str) -> str:
    """``SELECT [DISTINCT] TOP n`` → ``LIMIT n`` at the enclosing subquery's
    closing paren (or statement end).  One TOP per pass, last-in-string
    first, recomputing literal spans after each edit; paren depth is tracked
    literal-aware so TOP works in subqueries too."""
    while True:
        lit_spans = [m.span() for m in _LITERAL_RE.finditer(out)]

        def in_literal(i: int) -> bool:
            return any(a <= i < b for a, b in lit_spans)

        matches = [
            m
            for m in re.finditer(
                r"\bSELECT\s+(?:DISTINCT\s+)?TOP\s+(\d+)\s+", out, re.I
            )
            if not in_literal(m.start())
        ]
        if not matches:
            return out
        m = matches[-1]
        n = m.group(1)
        depth = 0
        insert_at = None
        for i in range(m.end(), len(out)):
            if in_literal(i):
                continue
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
                if depth < 0:  # the paren closing this subquery
                    insert_at = i
                    break
        if insert_at is None:
            out = out.rstrip().rstrip(";") + f" LIMIT {n}"
        else:
            out = out[:insert_at] + f" LIMIT {n} " + out[insert_at:]
        # drop the TOP clause itself (before the insertion point)
        out = out[: m.start()] + re.sub(
            r"TOP\s+\d+\s+", "", out[m.start() : m.end()], flags=re.I
        ) + out[m.end() :]


def _alias_equals(sql: str) -> str:
    """T-SQL ``[alias] = expr`` select items → ``expr AS alias``
    (queued_queries.sql:5 ``[queued_sec] = DATEDIFF(...) / 1000.0``).

    Only bracketed aliases directly after ``SELECT`` or a select-list comma
    are rewritten (a bare ``[col] = x`` in WHERE/ON is preceded by neither),
    and the expression end is found with a literal-aware depth scan — the
    next depth-0 comma, FROM, or statement end."""
    while True:
        lit_spans = [m.span() for m in _LITERAL_RE.finditer(sql)]

        def in_literal(i: int) -> bool:
            return any(a <= i < b for a, b in lit_spans)

        m = next(
            (
                m
                for m in re.finditer(
                    r"(,|\bSELECT\b)\s*\[(\w+)\]\s*=\s*(?![=<>])", sql, re.I
                )
                if not in_literal(m.start())
            ),
            None,
        )
        if m is None:
            return sql
        alias = m.group(2)
        depth = 0
        end = len(sql)
        for i in range(m.end(), len(sql)):
            if in_literal(i):
                continue
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0:
                if ch == ",":
                    end = i
                    break
                if (
                    ch in "FfOoGg"
                    and not re.match(r"\w", sql[i - 1])
                    and re.match(r"(?:FROM|ORDER|GROUP)\b", sql[i:], re.I)
                ):
                    end = i
                    break
        expr = sql[m.end() : end].rstrip()
        sql = sql[: m.start()] + m.group(1) + " " + expr + f" AS `{alias}` " + sql[end:]


def rewrite_tsql(sql: str) -> tuple[str, str | None]:
    """Rewrite one T-SQL statement → (spark_sql, label_or_None)."""
    label = None
    sql = _inline_declares(sql)
    m = re.search(r"\bOPTION\s*\(\s*LABEL\s*=\s*'((?:[^']|'')*)'\s*\)", sql, re.I)
    if m:
        label = m.group(1).replace("''", "'")
        sql = sql[: m.start()] + sql[m.end() :]

    # T-SQL quoted column alias (TempdbConsumption.sql:4 ``AS 'x'``) —
    # rewritten before literal splitting (the alias IS a quoted span)
    sql = re.sub(r"\bAS\s+'([A-Za-z_][\w ]*)'", r"AS `\1`", sql, flags=re.I)
    sql = _alias_equals(sql)
    # N'unicode literal' → plain literal (clean.sql:5).  Only an N that
    # PREFIXES a literal is dropped — an N inside one ('N', 'NOT x') is
    # content (the naive \bN' regex matched the closing quote of 'N')
    sql = _strip_nprefix(sql)
    # CREATE VIEW → temp view (the monitoring solution's views/*.sql deploy;
    # temp because they sit over session-scoped DMV snapshots)
    sql = re.sub(
        r"\bCREATE\s+VIEW\b", "CREATE OR REPLACE TEMP VIEW", sql, flags=re.I
    )
    # catalog-guarded drops (clean.sql:5-13):
    # IF EXISTS (SELECT ...) DROP VIEW|SCHEMA|PROCEDURE x → DROP x IF EXISTS
    sql = re.sub(
        r"\bIF\s+EXISTS\s*\((?:[^()]|\([^()]*\))*\)\s*"
        r"DROP\s+(VIEW|PROCEDURE|SCHEMA)\s+",
        r"DROP \1 IF EXISTS ",
        sql,
        flags=re.I,
    )

    # existence-guarded drop (GenerateLoadScript-V3 staging pattern):
    # IF OBJECT_ID('x'[, 'U']) IS NOT NULL DROP TABLE|VIEW t → IF EXISTS
    sql = re.sub(
        r"\bIF\s+OBJECT_ID\s*\(\s*'(?:[^']|'')*'\s*(?:,\s*'\w+'\s*)?\)\s+"
        r"IS\s+NOT\s+NULL\s+DROP\s+(TABLE|VIEW)\s+",
        r"DROP \1 IF EXISTS ",
        sql,
        flags=re.I,
    )

    # T-SQL string literals have NO escape character — a backslash is
    # data (GenerateLoadScript-V2.sql:144 strips \" sequences with
    # replace(x, '\"', '"')).  Spark's parser treats backslash as an
    # escape, so literal backslashes must double on the way through.
    parts = [(lit, seg.replace("\\", "\\\\") if lit else _rewrite_segment(seg))
             for lit, seg in _split_literals(sql)]
    out = "".join(seg for _, seg in _concat_plus(parts))
    return _rewrite_tops(out).strip(), label
