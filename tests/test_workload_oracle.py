"""Every registered workload query with an oracle must hash-match DuckDB.

This is the local mirror of the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from sql_data_warehouse_samples_spark import workload
from tests.conftest import SF_DIR
from tests.oracle_compare import compare

workload.load_all()

ORACLE_NAMES = sorted(workload.ORACLES)
ALL_NAMES = sorted(workload.QUERIES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, duck):
    df = workload.QUERIES[name](spark, SF_DIR)
    problems = compare(df, duck, workload.ORACLES[name])
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in workload.ORACLES])
def test_rows_only(name, spark):
    df = workload.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
