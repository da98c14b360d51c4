"""Cross-process concurrency stress for the versioned parquet store.

The reference gets uniqueness and update atomicity from Postgres
(UNIQUE constraints + transactions, init-db.sh:13,16); the parquet store
replicates that with an O_EXCL write lock + in-lock anti-join re-verify.
The single-process race tests cover the logic; THIS test runs two real
OS processes — each with its own JVM — hammering append_unique and
mark_uploaded against one store directory, then asserts the Postgres
invariants on the final state: no duplicate keys, no lost flag flips.
"""

from __future__ import annotations

import multiprocessing as mp
import os

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.store import CustomerStore

COLS = ["id", "first_name", "last_name", "email", "phone"]


def _worker(root: str, lo: int, hi: int, mark_lo: int, mark_hi: int) -> None:
    """Append ids [lo, hi) in chunks of 10 (ranges overlap between the two
    workers), then flip [mark_lo, mark_hi) to uploaded. Any failure is
    written to <root>/../worker_<pid>.err so the parent can surface it."""
    import traceback

    try:
        _worker_inner(root, lo, hi, mark_lo, mark_hi)
    except BaseException:
        with open(os.path.join(os.path.dirname(root), f"worker_{os.getpid()}.err"), "w") as f:
            traceback.print_exc(file=f)
        raise


def _worker_inner(root: str, lo: int, hi: int, mark_lo: int, mark_hi: int) -> None:
    from pyspark.sql import SparkSession

    from csv_crm_upload_spark.operators.mutate import finalize_columns

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"store-conc-{os.getpid()}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        store = CustomerStore(spark, root)
        ids = list(range(lo, hi))
        for at in range(0, len(ids), 10):
            chunk = ids[at : at + 10]
            batch = finalize_columns(
                spark.createDataFrame(
                    [(i, f"fn{i}", f"ln{i}", f"u{i}@x.com", str(i)) for i in chunk], COLS
                )
            )
            n = store.append_unique(batch)
            assert 0 <= n <= len(chunk)
        marks = spark.createDataFrame(
            [(f"u{i}@x.com",) for i in range(mark_lo, mark_hi)], ["email"]
        )
        flipped = store.mark_uploaded(marks)
        # every marked email exists by now (this worker appended its range,
        # overlap losers were inserted by the other worker) — but some may
        # already be flipped if ranges raced; flips never exceed the set
        assert 0 <= flipped <= mark_hi - mark_lo
    finally:
        spark.stop()


def test_two_process_append_and_flip_no_duplicates_no_lost_updates(spark, tmp_path):
    root = str(tmp_path / "store")
    CustomerStore(spark, root)  # init layout

    ctx = mp.get_context("spawn")  # never fork a live JVM
    # A appends 1..30 and marks 1..15; B appends 11..40 and marks 26..40.
    # Overlap 11..30 exercises the dup race; marks are within each
    # worker's own appended range so the rows exist when the flip runs.
    pa = ctx.Process(target=_worker, args=(root, 1, 31, 1, 16))
    pb = ctx.Process(target=_worker, args=(root, 11, 41, 26, 41))
    pa.start()
    pb.start()
    pa.join(600)
    pb.join(600)

    def _errs() -> str:
        out = []
        for name in os.listdir(tmp_path):
            if name.endswith(".err"):
                out.append(name + "\n" + (tmp_path / name).read_text()[-2000:])
        return "\n".join(out)

    assert pa.exitcode == 0, f"worker A failed\n{_errs()}"
    assert pb.exitcode == 0, f"worker B failed\n{_errs()}"

    store = CustomerStore(spark, root)
    final = store.read()
    rows = final.collect()
    assert len(rows) == 40
    # Postgres-UNIQUE invariant: no duplicate id or email survived the race
    assert final.select("id").distinct().count() == 40
    assert final.select("email").distinct().count() == 40
    # no lost updates: every marked email is uploaded in the final state
    uploaded = {r["email"] for r in rows if r["uploaded"]}
    expected = {f"u{i}@x.com" for i in range(1, 16)} | {
        f"u{i}@x.com" for i in range(26, 41)
    }
    assert uploaded == expected
    # and nothing else was flipped
    assert final.filter(~F.col("uploaded")).count() == 40 - len(expected)
