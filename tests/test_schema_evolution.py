"""Schema evolution on the versioned store — the ALTER TABLE ADD COLUMN
surface of a lakehouse table format, realized as metadata-only commits:
no data rewrite, mixed-schema snapshots read through mergeSchema, old
rows fill with the column default (SQL `NOT NULL DEFAULT x` semantics
when a default is given, nullable/NULL otherwise)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.mutate import finalize_columns
from csv_crm_upload_spark.operators.store import CustomerStore

ROWS = [
    (1, "jon", "doe", "jon@x.com", "1"),
    (2, "jane", "doe", "jane@x.com", "2"),
    (3, "ann", "lee", "ann@x.com", "3"),
]
COLS = ["id", "first_name", "last_name", "email", "phone"]


def _store(spark, tmp_path) -> CustomerStore:
    store = CustomerStore(spark, str(tmp_path / "store"))
    store.append(finalize_columns(spark.createDataFrame(ROWS, COLS)))
    return store


def test_add_column_is_metadata_only(spark, tmp_path):
    store = _store(spark, tmp_path)
    files_before = {
        (d, f)
        for d, _, fs in os.walk(store._version_dir(store._current_version()))
        for f in fs
    }
    v_before = store._current_version()
    store.add_column("tier", "string", default="std")
    assert store._current_version() == v_before  # no data commit
    files_after = {
        (d, f)
        for d, _, fs in os.walk(store._version_dir(store._current_version()))
        for f in fs
    }
    assert files_after == files_before  # not a single file touched
    # old rows read the default
    assert {r["tier"] for r in store.read().collect()} == {"std"}


def test_mixed_schema_read_and_time_travel(spark, tmp_path):
    store = _store(spark, tmp_path)
    v0 = store._current_version()
    store.add_column("tier", "string", default="std")
    batch = spark.createDataFrame(
        [(10, "new", "guy", "new@x.com", "9", "gold")], COLS + ["tier"]
    )
    store.append(finalize_columns(batch))
    got = {r["email"]: r["tier"] for r in store.read().collect()}
    assert got == {
        "jon@x.com": "std", "jane@x.com": "std", "ann@x.com": "std",
        "new@x.com": "gold",
    }
    # time travel reads old snapshots through the WIDENED schema too
    old = store.read_version(v0)
    assert "tier" in old.columns
    assert {r["tier"] for r in old.collect()} == {"std"}


def test_add_column_without_default_is_nullable(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.add_column("score", "double")
    rows = store.read().collect()
    assert all(r["score"] is None for r in rows)
    store.append(
        finalize_columns(
            spark.createDataFrame([(11, "x", "y", "s@x.com", "1", 0.5)], COLS + ["score"])
        )
    )
    got = {r["email"]: r["score"] for r in store.read().collect()}
    assert got["s@x.com"] == 0.5 and got["jon@x.com"] is None


def test_mutations_preserve_evolved_columns(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.add_column("tier", "string", default="std")
    store.append(
        finalize_columns(
            spark.createDataFrame([(10, "new", "guy", "new@x.com", "9", "gold")], COLS + ["tier"])
        )
    )
    # keyed UPDATE rewrites only affected buckets — tier must survive it
    flipped = store.mark_uploaded(spark.createDataFrame([("new@x.com",)], ["email"]))
    assert flipped == 1
    got = {r["email"]: (r["tier"], r["uploaded"]) for r in store.read().collect()}
    assert got["new@x.com"] == ("gold", True)
    assert got["jon@x.com"] == ("std", False)
    # MERGE: update path preserves tier, insert path takes the default
    res = store.merge(
        spark.createDataFrame(
            [(10, "renamed", "guy", "new@x.com", "9"), (20, "ins", "ert", "ins@x.com", "7")],
            COLS,
        )
    )
    assert res == {"updated": 1, "inserted": 1, "skipped": 0}
    got = {r["email"]: (r["tier"], r["first_name"]) for r in store.read().collect()}
    assert got["new@x.com"] == ("gold", "renamed")
    assert got["ins@x.com"] == ("std", "ins")


def test_changes_feed_spans_schema_evolution(spark, tmp_path):
    store = _store(spark, tmp_path)
    v0 = store._current_version()
    store.add_column("tier", "string", default="std")
    store.append(
        finalize_columns(
            spark.createDataFrame([(10, "new", "guy", "new@x.com", "9", "gold")], COLS + ["tier"])
        )
    )
    feed = store.changes(v0).collect()
    assert {(r["email"], r["_change_type"]) for r in feed} == {("new@x.com", "insert")}
    assert feed[0]["tier"] == "gold"


def test_append_unique_respects_evolved_schema(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.add_column("tier", "string", default="std")
    inserted = store.append_unique(
        finalize_columns(
            spark.createDataFrame(
                [(1, "dup", "row", "jon@x.com", "1"), (30, "ok", "row", "ok@x.com", "3")],
                COLS,
            )
        )
    )
    assert inserted == 1
    got = {r["email"]: r["tier"] for r in store.read().collect()}
    assert got["ok@x.com"] == "std"


def test_add_column_rejects_duplicates_and_bad_types(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError):
        store.add_column("email", "string")
    store.add_column("tier", "string", default="std")
    with pytest.raises(ValueError):
        store.add_column("tier", "string")
    with pytest.raises(Exception):
        store.add_column("bad", "not_a_type")
    # second process opening the same root sees the evolved schema
    reopened = CustomerStore(spark, store.root)
    assert "tier" in reopened.read().columns
