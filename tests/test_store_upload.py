"""Store mutation + HTTP upload path tests — mirror the reference's
uploader behavior (select pending → POST → mark uploaded; at-least-once
with retry, SURVEY §2.9) and the FIXTURES.md §5 invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.mutate import finalize_columns
from csv_crm_upload_spark.operators.store import CustomerStore
from csv_crm_upload_spark.sinks.http_sink import fibonacci_backoff
from csv_crm_upload_spark.streaming.pipeline import run_upload_cycle
from tests.mock_crm import MockCRM

ROWS = [
    (1, "jon", "doe", "jon@x.com", "1"),
    (2, "jane", "doe", "jane@x.com", "2"),
    (3, "ann", "lee", "ann@x.com", "3"),
    (4, "bob", "ray", "bob@x.com", "4"),
    (5, "cat", "paw", "cat@x.com", "5"),
]
COLS = ["id", "first_name", "last_name", "email", "phone"]


def _fresh_store(spark, tmp_path) -> CustomerStore:
    store = CustomerStore(spark, str(tmp_path / "store"))
    store.append(finalize_columns(spark.createDataFrame(ROWS, COLS)))
    return store


def test_fibonacci_backoff_sequence():
    # reference uploader.go:161-170: 1,2,3,5,8,...
    assert list(fibonacci_backoff(6)) == [1.0, 2.0, 3.0, 5.0, 8.0, 13.0]


def test_pending_projection_and_filter(spark, tmp_path):
    store = _fresh_store(spark, tmp_path)
    pending = store.pending()
    assert pending.columns == COLS  # P1: exactly the 5 upload columns
    assert pending.count() == 5
    store.mark_uploaded(spark.createDataFrame([("jon@x.com",)], ["email"]))
    assert store.pending().count() == 4  # F1: uploaded=false only


def test_mark_uploaded_refreshes_modified_ts(spark, tmp_path):
    store = _fresh_store(spark, tmp_path)
    before = {r["email"]: r["modified_ts"] for r in store.read().collect()}
    flipped = store.mark_uploaded(spark.createDataFrame([("jane@x.com",)], ["email"]))
    assert flipped == 1
    after = {r["email"]: (r["uploaded"], r["modified_ts"]) for r in store.read().collect()}
    assert after["jane@x.com"][0] is True
    assert after["jane@x.com"][1] > before["jane@x.com"]  # U2 trigger semantics
    assert after["jon@x.com"][0] is False
    assert after["jon@x.com"][1] == before["jon@x.com"]


def test_upload_cycle_happy_path(spark, tmp_path):
    store = _fresh_store(spark, tmp_path)
    with MockCRM() as crm:
        marked = run_upload_cycle(store, crm.url, concurrency=2, sleep=lambda s: None)
    assert marked == 5
    assert store.pending().count() == 0
    emails = {r["email"] for r in store.read().filter(F.col("uploaded")).collect()}
    assert {p["email"] for p in crm.received} == emails == {r[3] for r in ROWS}


def test_upload_retry_on_flaky_sink(spark, tmp_path):
    store = _fresh_store(spark, tmp_path)
    with MockCRM(fail_every=3) as crm:  # every 3rd request 503s
        marked = run_upload_cycle(store, crm.url, concurrency=1, max_tries=5, sleep=lambda s: None)
        assert crm.failed > 0
    # retries converge: every row eventually 201s and is marked
    assert marked == 5
    assert store.pending().count() == 0


def test_upload_once_no_resend_after_marked(spark, tmp_path):
    # FIXTURES.md §5 invariant: no email POSTed again after uploaded=true
    store = _fresh_store(spark, tmp_path)
    with MockCRM() as crm:
        run_upload_cycle(store, crm.url, sleep=lambda s: None)
        first_total = crm.total
        marked2 = run_upload_cycle(store, crm.url, sleep=lambda s: None)
        assert marked2 == 0
        assert crm.total == first_total  # second cycle found nothing pending


def test_failed_only_rows_stay_pending(spark, tmp_path):
    store = _fresh_store(spark, tmp_path)
    with MockCRM(fail_every=1) as crm:  # sink fully down: all 503
        marked = run_upload_cycle(store, crm.url, concurrency=1, max_tries=2, sleep=lambda s: None)
    assert marked == 0
    assert store.pending().count() == 5  # at-least-once: re-sent next cycle


def test_write_lock_blocks_then_releases(spark, tmp_path):
    import os
    import pytest as _pytest

    store = _fresh_store(spark, tmp_path)
    lock = os.path.join(store.root, "_LOCK")
    open(lock, "w").write("held")  # simulate a crashed/concurrent writer
    with _pytest.raises(TimeoutError):
        with store._write_lock(timeout_s=0.5):
            pass
    os.remove(lock)
    # after release, mutation works and data is intact
    marked = store.mark_uploaded(spark.createDataFrame([("jon@x.com",)], ["email"]))
    assert marked == 1
    assert store.read().count() == 5
