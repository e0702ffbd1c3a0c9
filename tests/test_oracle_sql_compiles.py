"""Every oracle_sql() entry must at least PLAN in DuckDB.

The full hash-comparison sweeps run per round (35+ min); this test is
the seconds-fast guard that catches oracle SQL typos, overflow-prone
INT32 literals caught only at bind time, and schema drift immediately
at edit time.  EXPLAIN binds and optimizes without executing, so the
whole registry checks in seconds against the sf0.001 views.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    return c


def test_every_oracle_plans(con):
    failures = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {str(e)[:140]}"))
    assert failures == []


def test_oracle_keys_subset_of_registry(con):
    qs = set(entry_mod.queries())
    extra = [k for k in entry_mod.oracle_sql() if k not in qs]
    assert extra == [], f"oracles without a queries() entry: {extra}"
