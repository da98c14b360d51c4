"""Opt-in FULL oracle-parity sweep at sf0.1 (judge r8 ask #3): every
oracle pair, Spark vs DuckDB, at 10x the driver's correctness scale.
Catches the scale-DEPENDENT divergence classes the sf0.001/sf0.01 gates
cannot — partition-count-sensitive sampling, AQE plan flips, rounding
ties that only materialize on bigger value grids.

Run once per round:  python -m pytest tests/test_sf01_parity.py -m sf01 -q
(the repo pytest.ini deselects the sf01 marker by default, so the
normal suite's wall time is unchanged).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_parity import TABLES, _rows_to_sorted

pytestmark = pytest.mark.sf01

SF01_DIR = "/root/testdata/sf0.1"

# Own pcarec1 snapshot for THIS module's query/oracle pair: the sweep
# often runs CONCURRENTLY with the full suite as a separate process —
# a shared snapshot path would race between one process's Spark write
# and the other's paired DuckDB read. Both queries() and oracle_sql()
# bake the path at build time, so the override is scoped to exactly
# these two dicts and restored immediately (modules built earlier or
# later in the same process keep the default, themselves consistent).
_SCOPED = {
    "SPARK_GRAFT_PCAREC1_SNAPSHOT": "/tmp/spark_graft_pcarec1_snapshot_sf01.parquet",
    # same reasoning for the daily-rollup artifact the roll1/roll2
    # entries build at call time
    "SPARK_GRAFT_ROLLUP_DIR": "/tmp/spark_graft_rollup_sf01",
}
_prev = {k: os.environ.get(k) for k in _SCOPED}
os.environ.update(_SCOPED)
try:
    QUERIES = entrymod.queries()
    ORACLES = entrymod.oracle_sql()
finally:
    for k, v in _prev.items():
        if v is None:
            del os.environ[k]
        else:
            os.environ[k] = v


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_sf01_query_matches_oracle(name, spark, duck01):
    sdf = QUERIES[name](spark, SF01_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck01.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_to_sorted(spark_rows, spark_cols)
    d = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches, first 3: {mismatches[:3]}"
    )
