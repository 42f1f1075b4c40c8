"""Property-based tests (hypothesis): T-SQL rewriter invariants and loader
tolerant-cast semantics over generated inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sql_data_warehouse_samples_spark.functions.rewriter import rewrite_tsql

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_ ]{0,20}", fullmatch=True)
# literal body: anything but quotes/newlines (embedded '' quoting tested
# separately)
_lit_body = st.text(
    alphabet=st.characters(blacklist_characters="'\r\n", min_codepoint=32, max_codepoint=126),
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(ident=_ident, lit=_lit_body)
def test_rewriter_preserves_literals_and_debrackets(ident, lit):
    sql = f"SELECT [{ident}] FROM t WHERE x = '{lit}' AND [{ident}] IS NOT NULL"
    out, label = rewrite_tsql(sql)
    assert label is None
    # the literal survives byte-for-byte, modulo the documented
    # backslash-doubling (T-SQL literals are escape-free; Spark's parser
    # escapes, so the rewriter doubles to preserve the characters)
    assert "'{}'".format(lit.replace("\\", "\\\\")) in out
    # no bracket identifiers remain outside literals
    stripped = re.sub(r"'(?:[^']|'')*'", "", out)
    assert "[" not in stripped and "]" not in stripped
    assert f"`{ident}`" in out


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**6), lit=_lit_body)
def test_rewriter_top_to_limit(n, lit):
    out, _ = rewrite_tsql(f"SELECT TOP {n} a FROM t WHERE b <> '{lit}' ORDER BY a")
    assert out.endswith(f"LIMIT {n}")
    assert "TOP" not in re.sub(r"'(?:[^']|'')*'", "", out)


@settings(max_examples=100, deadline=None)
@given(label=_lit_body)
def test_rewriter_label_extraction(label):
    quoted = label.replace("'", "''")
    out, got = rewrite_tsql(f"SELECT 1 AS x OPTION (LABEL = '{quoted}')")
    assert got == label
    assert "OPTION" not in out.upper()


@settings(max_examples=50, deadline=None)
@given(
    parts=st.lists(
        st.sampled_from(["ISNULL(a, 0)", "GETDATE()", "COUNT_BIG(*)", "[c d]"]),
        min_size=1,
        max_size=4,
    )
)
def test_rewriter_idempotent(parts):
    """Rewriting an already-rewritten statement is a no-op."""
    sql = "SELECT " + ", ".join(parts) + " FROM t"
    once, _ = rewrite_tsql(sql)
    twice, _ = rewrite_tsql(once)
    assert once == twice


def test_loader_tolerant_cast_properties(spark):
    """Generated value/type matrix: substitute-sentinel semantics hold for
    every unparseable cell, parseable cells cast exactly."""
    from sql_data_warehouse_samples_spark.sources.csv_loader import (
        DEFAULT_SENTINELS,
        ColumnSpec,
        LoadOptions,
        _tolerant_cast,
    )
    from pyspark.sql import functions as F

    good_ints = ["0", "42", "-7", "2147483647"]
    bad_ints = ["x", "12.5.3", "", "2147483648999999999999"]
    rows = [(v,) for v in good_ints + bad_ints]
    df = spark.createDataFrame(rows, "raw string")
    opts = LoadOptions(on_error="substitute")
    spec = ColumnSpec("raw", "int", nullable=False)
    out = df.withColumn("cast", _tolerant_cast(F.col("raw"), spec, opts, "int")).collect()
    sentinel = int(DEFAULT_SENTINELS["int"])
    for r in out:
        if r.raw in good_ints:
            assert r.cast == int(r.raw), r
        else:
            assert r.cast == sentinel or r.cast is None, r


# --- pure-Python invariants of the new sampling/quantile operators ---------


@settings(max_examples=200, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
    ),
    shares=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
        min_size=1,
    ),
    budget=st.integers(min_value=0, max_value=100_000),
)
def test_mixture_rates_invariants(counts, shares, budget):
    from sql_data_warehouse_samples_spark.operators.sampling import mixture_rates

    rates = mixture_rates(counts, shares, budget)
    # only listed sources with population; rates in (0, 1]
    assert set(rates) <= set(shares)
    for s, r in rates.items():
        assert counts.get(s, 0) > 0
        assert 0.0 <= r <= 1.0
        # expected kept rows never exceed the source quota (cap at keep-all)
        total = sum(shares.values())
        assert r * counts[s] <= shares[s] / total * budget + 1e-6 or r == 1.0


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2,
        max_size=50,
    ),
    n=st.integers(min_value=2, max_value=5),
)
def test_bucket_expr_thresholds_are_monotone(values, n):
    """The CASE chain of approx_ntile: assignment is monotone in the value
    and every bucket id is within [1, n] — checked via the pure-Python
    mirror of the boundary comparison."""
    import numpy as np

    bounds = list(np.quantile(np.array(values), [i / n for i in range(1, n)]))

    def assign_asc(v):
        for k, b in enumerate(bounds, 1):
            if v <= b:
                return k
        return n

    got = [assign_asc(v) for v in sorted(values)]
    assert got == sorted(got)  # monotone
    assert all(1 <= g <= n for g in got)
    # descending mirror reverses the ranking
    def assign_desc(v):
        for k in range(1, n):
            if v > bounds[n - 1 - k]:
                return k
        return n

    got_desc = [assign_desc(v) for v in sorted(values, reverse=True)]
    assert got_desc == sorted(got_desc)
