"""Local replica of the driver's correctness gate: run every
`queries()[name]` on Spark AND `oracle_sql()[name]` on DuckDB over the
same parquet tables; compare row count, column names/order-insensitive
sorted values exactly.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_SF_DIR_TEST to
/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in ORACLES:
        pytest.skip("no oracle (rows-only check)")
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s = _rows_to_sorted(spark_rows, spark_cols)
    d = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first 3: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["id", "first_name", "last_name", "email", "phone"]


def test_rotation_front_keys_exist_and_window_is_full():
    """_ROTATION_FRONT drives which queries the driver's 50-row
    CORRECTNESS window samples. A typo'd key silently drops out of the
    reorder (the filter keeps only known keys), shrinking the window —
    this pins that every listed key exists, the list is duplicate-free,
    and the first 50 queries() entries are 50 DISTINCT keys."""
    front = entrymod._ROTATION_FRONT
    names = list(QUERIES)
    missing = [k for k in front if k not in QUERIES]
    assert not missing, f"_ROTATION_FRONT keys not in queries(): {missing}"
    assert len(front) == len(set(front)), "duplicate keys in _ROTATION_FRONT"
    assert 12 + len(front) <= 50, (
        f"front ({len(front)}) overflows the 50-slot window: the tail "
        "entries would silently fall outside the driver's sample"
    )
    assert len(set(names[:50])) == 50
    # every oracle key must have a queries() entry (a dangling oracle is
    # a dead driver row)
    dangling = [k for k in ORACLES if k not in QUERIES]
    assert not dangling, f"oracle_sql keys without queries(): {dangling}"
