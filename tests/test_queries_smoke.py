"""Smoke: every declared query runs at sf0.001 and returns a stable schema.

Full value-level parity against DuckDB is exercised by
tools/check_oracle.py (and the driver's own gate at sf0.01); here we keep
the fast invariants: runs, non-degenerate output, aliased columns on both
sides agree.
"""

from __future__ import annotations

import duckdb
import pytest

from onetable_spark.queries import ORACLE_SQL, SPARK_QUERIES
from onetable_spark.session import TABLES


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_query_runs_and_matches_oracle_columns(spark, sf_dir, name):
    df = SPARK_QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    sql = ORACLE_SQL.get(name)
    if sql is None:
        return
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_cols = sorted(d[0] for d in con.execute(sql).description)
    assert sorted(df.columns) == oracle_cols, f"{name}: column names must match oracle"


def test_every_oracle_has_a_query():
    assert set(ORACLE_SQL) <= set(SPARK_QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
