"""Property-based tests for the T-SQL → Spark SQL rewriter.

The rewriter is regex-driven over literal-split spans; these properties pin
the invariants the verbatim-script corpus depends on, across generated
inputs (not just the corpus's exact bytes):

* string literals survive byte-for-byte (never rewritten);
* no bracket identifiers remain outside literals;
* every ``SELECT TOP n`` becomes exactly one ``LIMIT n`` (same n, count
  preserved through nesting);
* ``[alias] = expr`` select items keep the alias and the expression.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sql_data_warehouse_samples_spark.functions.rewriter import (
    _LITERAL_RE,
    rewrite_tsql,
)

ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)
# literal content: anything printable minus the quote (escaped quotes are
# exercised separately)
lit_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="'"),
    max_size=20,
)


@given(col=ident, val=lit_text)
@settings(max_examples=200, deadline=None)
def test_literals_survive_verbatim(col, val):
    sql = f"SELECT [{col}] FROM t WHERE note = '{val}' AND x = 'TOP 5 [z]'"
    out, _ = rewrite_tsql(sql)
    # T-SQL literals are escape-free; the rewriter doubles backslashes so
    # Spark's escaping parser sees the same characters — otherwise the
    # text passes through verbatim
    expected = val.replace("\\", "\\\\")
    assert f"'{expected}'" in out
    assert "'TOP 5 [z]'" in out  # rewriter keywords inside literals untouched


@given(cols=st.lists(ident, min_size=1, max_size=5, unique=True))
@settings(max_examples=100, deadline=None)
def test_no_brackets_left_outside_literals(cols):
    sql = "SELECT " + ", ".join(f"[{c}]" for c in cols) + " FROM [dbo].[t]"
    out, _ = rewrite_tsql(sql)
    outside = _LITERAL_RE.sub("", out)
    assert "[" not in outside and "]" not in outside


@given(n1=st.integers(1, 999), n2=st.integers(1, 999))
@settings(max_examples=100, deadline=None)
def test_top_n_becomes_limit_n_through_nesting(n1, n2):
    sql = (
        f"SELECT TOP {n1} a FROM (SELECT TOP {n2} b FROM t ORDER BY b) s"
        " ORDER BY a"
    )
    out, _ = rewrite_tsql(sql)
    assert "TOP" not in out.upper()
    limits = [int(m) for m in re.findall(r"LIMIT (\d+)", out)]
    assert sorted(limits) == sorted([n1, n2])


@given(alias=ident, col=ident)
@settings(max_examples=100, deadline=None)
def test_alias_equals_preserves_alias_and_expr(alias, col):
    sql = f"SELECT [{alias}] = MAX({col}) FROM t GROUP BY g"
    out, _ = rewrite_tsql(sql)
    assert f"AS `{alias}`" in out
    assert f"MAX({col})" in out
    # WHERE-clause equality is NOT treated as an alias
    sql2 = f"SELECT x FROM t WHERE [{col}] = 5"
    out2, _ = rewrite_tsql(sql2)
    assert f"`{col}` = 5" in out2


@given(label=lit_text)
@settings(max_examples=100, deadline=None)
def test_option_label_extracted(label):
    sql = f"SELECT 1 AS one OPTION (LABEL = '{label}')"
    out, got = rewrite_tsql(sql)
    assert got == label
    assert "OPTION" not in out.upper()


@settings(max_examples=150, deadline=None)
@given(
    depth=st.integers(min_value=0, max_value=4),
    typ=st.sampled_from(
        [("varchar", "STRING"), ("int", "INT"), ("decimal(10,2)", "DECIMAL(10,2)")]
    ),
    inner=st.sampled_from(["a", "a + b", "coalesce(a, b)", "f(g(a), h(b, c))"]),
    style=st.booleans(),
)
def test_convert_depth_scan_roundtrip(depth, typ, inner, style):
    """CONVERT with arbitrarily nested second arguments becomes CAST with
    the expression preserved verbatim; a trailing style integer drops."""
    tsql_t, spark_t = typ
    expr = "(" * depth + inner + ")" * depth
    arg = f"{expr}, 120" if style else expr
    out, _ = rewrite_tsql(f"SELECT CONVERT({tsql_t}, {arg}) AS x FROM t")
    assert f"CAST({expr} AS {spark_t})" in out
    assert "CONVERT" not in out.upper()


# ---------------------------------------------------------------------------
# T-SQL UPDATE statement splitter (engine._try_tsql_dml): the quote-aware
# SET/WHERE scanner must never split inside string literals.
# ---------------------------------------------------------------------------

_set_val = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters="'"),
    min_size=0, max_size=24,
)

import pytest


@pytest.fixture(scope="module")
def dml_engine(spark):
    from sql_data_warehouse_samples_spark.engine import Engine

    return Engine(spark)


@given(v1=_set_val, v2=_set_val)
@settings(max_examples=60, deadline=None)
def test_update_split_survives_commas_and_where_in_literals(dml_engine, v1, v2):
    """Whatever printable junk the literals carry — commas, the word
    WHERE, brackets, parens — the parser must find exactly the two SET
    assignments and the real WHERE clause."""
    eng = dml_engine
    captured = {}

    def fake_update(table, assigns, pred):
        captured["table"], captured["assigns"], captured["pred"] = (
            table, dict(assigns), pred,
        )
        return 0

    eng.catalog.update_where = fake_update
    lit1 = v1.replace("'", "''")
    lit2 = v2.replace("'", "''")
    eng._try_tsql_dml(
        f"UPDATE t SET a = '{lit1}', b = '{lit2}' WHERE id = 1"
    )
    assert captured["table"] == "t"
    assert set(captured["assigns"]) == {"a", "b"}
    # the rewriter doubles backslashes (T-SQL literals are escape-free)
    assert captured["assigns"]["a"] == "'{}'".format(lit1.replace("\\", "\\\\"))
    assert captured["assigns"]["b"] == "'{}'".format(lit2.replace("\\", "\\\\"))
    assert captured["pred"].strip() == "id = 1"
