"""Simulate the driver's verify: smoke entry(spark) at sf0.001, then run
every queries() entry at sf0.01 against its oracle_sql() via DuckDB.

Usage: python scripts/driver_sim.py [--only name_substring]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from tests.oracle_compare import compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    # Deliberately a VANILLA session (not build_session): the external driver
    # constructs its own SparkSession, so queries must not depend on any conf
    # our session factory sets (this masked the r01 events NANOS failure).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    print("== smoke: entry(spark) at sf0.001 ==")
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry -> {len(rows)} rows, schema: {df.schema.simpleString()}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"== {len(qs)} queries, {len(oracles)} with oracles ==")
    n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            if name in oracles:
                problems = compare(sdf, con, oracles[name])
                status = "OK " if not problems else "FAIL"
                if problems:
                    n_fail += 1
            else:
                n = sdf.count()
                problems = []
                status = f"OK(rows-only:{n})"
        except Exception as e:  # noqa: BLE001
            status, problems = "ERROR", [repr(e)[:500]]
            n_fail += 1
        dt = time.time() - t0
        print(f"{status:>18} {name} ({dt:.1f}s)")
        for p in problems:
            print(f"      {p}")
    print(f"== done: {n_fail} failures ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
