"""Persisted per-batch sketch-audit log (analytics/auditlog.py): the
exactly-once append contract, the facts-not-counts compaction, the
alert readout, and the streaming twin — the invariants the audlog1
oracle pair cannot observe (it sees one healthy build, never a replay
or a crash)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from csv_crm_upload_spark.analytics import auditlog as al
from csv_crm_upload_spark.operators.manifest import read_manifest


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rows(spark, path):
    return sorted(
        tuple(r) for r in al.read_audit_rows(spark, path).collect()
    )


def test_append_is_exactly_once_under_replay(spark, events, tmp_path):
    """A replayed streaming batch (same txn) must no-op: the log holds
    each batch's rows ONCE no matter how many times foreachBatch
    re-delivers it."""
    p = str(tmp_path / "log")
    al.save_audit_log(spark, p)
    al.append_batch_audit(events, p, "b0", txn=("app", 1))
    once = _rows(spark, p)
    assert once, "clean fixture must produce audit rows"
    al.append_batch_audit(events, p, "b0", txn=("app", 1))  # replay
    assert _rows(spark, p) == once
    assert read_manifest(p)["epoch"] == 1
    # a NEW txn for a new batch does append
    al.append_batch_audit(events.limit(50), p, "b1", txn=("app", 2))
    assert read_manifest(p)["epoch"] == 2
    assert len(_rows(spark, p)) > len(once)


def test_empty_batch_is_a_clean_noop(spark, events, tmp_path):
    """No rows → no epoch advance and no directory mutation (the
    rollup rule: orphan self-heal must not run on a no-op append)."""
    p = str(tmp_path / "log")
    al.save_audit_log(spark, p)
    before = read_manifest(p)
    al.append_batch_audit(events.limit(0), p, "empty", txn=("app", 1))
    assert read_manifest(p) == before
    assert _rows(spark, p) == []


def test_compaction_folds_facts_without_loss_or_double(spark, events, tmp_path):
    """Compaction is a plain union fold — the merged epoch holds
    exactly the logged rows (facts appear once, unlike additive counts
    there is nothing to sum), and the manifest collapses to one live
    epoch while preserving last_txn (the replay guard)."""
    p = str(tmp_path / "log")
    al.save_audit_log(spark, p)
    for i in range(3):
        al.append_batch_audit(
            al._batch_of(events, i), p, f"b{i}", txn=("app", i + 1)
        )
    before = _rows(spark, p)
    assert al.compact_audit_log(spark, p)
    m = read_manifest(p)
    assert m["epoch"] == m["base_epoch"]
    assert m["last_txn"] == {"app": 3}
    assert _rows(spark, p) == before
    assert not al.compact_audit_log(spark, p)  # already compact


def test_alerts_are_the_out_of_bound_rows(spark, events, tmp_path):
    """audit_alerts returns exactly the within_bound=false subset —
    empty on the healthy fixture (HLL at rsd 0.02 sits far inside the
    3-sigma envelope on real cardinalities)."""
    p = str(tmp_path / "log")
    al.save_audit_log(spark, p)
    al.append_batch_audit(events, p, "b0", txn=("app", 1))
    rows = al.read_audit_rows(spark, p)
    n_bad = rows.filter(~F.col("within_bound")).count()
    assert al.audit_alerts(spark, p).count() == n_bad == 0


def test_key_format_guard_rejects_foreign_artifact(spark, events, tmp_path):
    """An artifact written under a different derived-key format must be
    refused loudly (check_key_format), never silently unioned."""
    from csv_crm_upload_spark.analytics.rollup import save_daily_rollup

    p = str(tmp_path / "not_a_log")
    save_daily_rollup(events, p)
    with pytest.raises(ValueError):
        al.read_audit_rows(spark, p)
    with pytest.raises(ValueError):
        al.append_batch_audit(events, p, "b0")


def test_streaming_twin_logs_each_micro_batch_exactly_once(
    spark, events, tmp_path
):
    """run_index_maintenance_stream(audit_log=...): each event
    micro-batch appends its verdict rows under the (app, batch_id)
    manifest guard; draining the SAME checkpoint again (the restart
    path) appends nothing new."""
    from csv_crm_upload_spark.streaming.index_service import (
        run_index_maintenance_stream,
    )

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    p = str(tmp_path / "log")
    os.makedirs(drop)
    al.save_audit_log(spark, p)
    events.limit(200).write.parquet(f"{drop}/shard_1")

    q = run_index_maintenance_stream(
        spark, drop, ckpt, kind="events", audit_log=p, app_id="audit-e2e"
    )
    q.awaitTermination(120)
    first = _rows(spark, p)
    assert first, "the drained shard must have logged audit rows"
    keys = {r[0] for r in first}
    assert all(k.startswith("audit-e2e-") for k in keys)

    # restart over the same checkpoint: nothing new to drain, log unchanged
    q2 = run_index_maintenance_stream(
        spark, drop, ckpt, kind="events", audit_log=p, app_id="audit-e2e"
    )
    q2.awaitTermination(120)
    assert _rows(spark, p) == first
