"""Full-system end-to-end: the complete reference workflow — CSVs arrive
in a directory, streaming ingest validates/dedups into the store, upload
cycles POST pending rows to a (flaky) CRM and flip flags, new files
arrive, everything converges. One scenario, every moving part."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.store import CustomerStore
from csv_crm_upload_spark.streaming.pipeline import run_ingest_stream, run_upload_cycle
from tests.mock_crm import MockCRM


def test_full_pipeline_converges(spark, tmp_path):
    inp = tmp_path / "incoming"
    inp.mkdir()
    store = CustomerStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")
    qdir = str(tmp_path / "q")

    # wave 1: two files, one with problems
    (inp / "a.csv").write_text("1,jon,doe,jon@x.com,1\n2,jane,doe,jane@x.com,2\n")
    (inp / "b.csv").write_text("bad,id,row,x@x.com,3\n3,sam,lee,sam@x.com,3\n4,no,mail,,4\n")
    run_ingest_stream(spark, str(inp), store, ckpt, header=False).awaitTermination(120)
    assert store.pending().count() == 3  # 1, 2, 3

    with MockCRM(fail_every=4) as crm:  # flaky sink
        marked = run_upload_cycle(store, crm.url, concurrency=2, max_tries=6, sleep=lambda s: None)
        assert marked == 3
        assert store.pending().count() == 0
        first_posts = crm.total

        # wave 2: a new file with one new customer + dups of uploaded ones
        (inp / "c.csv").write_text("1,jon,doe,jon@x.com,1\n5,new,guy,new@x.com,5\n")
        run_ingest_stream(spark, str(inp), store, ckpt, header=False).awaitTermination(120)
        table = store.read()
        assert table.count() == 4  # 1,2,3 + 5; dup of 1 rejected
        assert store.pending().count() == 1  # only the new customer

        # second upload cycle: ONLY the new row is POSTed
        marked2 = run_upload_cycle(store, crm.url, concurrency=2, max_tries=6, sleep=lambda s: None)
        assert marked2 == 1
        new_posts = [p["email"] for p in crm.received[first_posts - crm.failed :]]
        assert "new@x.com" in new_posts
        assert store.pending().count() == 0

    # final state: uploaded-exactly-once semantics converged
    final = store.read()
    assert final.filter(F.col("uploaded")).count() == 4
    assert {r["email"] for r in final.collect()} == {
        "jon@x.com", "jane@x.com", "sam@x.com", "new@x.com"
    }
