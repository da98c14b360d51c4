"""Model-based property test for the store MERGE: any sequence of upsert
batches (interleaved with flag flips) must leave the store equal to a
plain-dict reference model applying the documented semantics —
matched-email update (id/flag/created preserved), new-email insert,
id-conflict skip."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_crm_upload_spark.operators.store import CustomerStore

COLS = ["id", "first_name", "last_name", "email", "phone"]

# batches have unique ids AND emails internally (the documented contract
# is dedupe-first; uniqueness inside the batch isolates MERGE semantics)
_row = st.tuples(
    st.integers(1, 8),                     # narrow id space → collisions
    st.sampled_from([f"u{i}@x.com" for i in range(6)]),
    st.sampled_from(["ann", "bob", "cat", "dan"]),
)
_batch = st.lists(
    _row, min_size=1, max_size=4, unique_by=(lambda r: r[0], lambda r: r[1])
)
_counter = itertools.count()


@given(batches=st.lists(_batch, min_size=1, max_size=3))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_matches_reference_model(spark, tmp_path, batches):
    store = CustomerStore(spark, str(tmp_path / f"s{next(_counter)}"))
    model: dict[str, dict] = {}  # email -> row state

    for bi, batch in enumerate(batches):
        now = f"2026-03-{bi + 1:02d} 00:00:00"
        src = spark.createDataFrame(
            [(i, fn, "ln", e, str(i)) for i, e, fn in batch], COLS
        )
        res = store.merge(src, now=now)

        want = {"updated": 0, "inserted": 0, "skipped": 0}
        pre_ids = {r["id"] for r in model.values()}
        for i, e, fn in batch:
            if e in model:
                model[e].update(first_name=fn, phone=str(i))
                want["updated"] += 1
            elif i in pre_ids:
                want["skipped"] += 1
            else:
                model[e] = {"id": i, "first_name": fn, "phone": str(i), "uploaded": False}
                want["inserted"] += 1
        assert res == want, f"batch {bi}: {res} != {want}"

        # flip the lexicographically-first pending email, model alongside
        pending = sorted(e for e, r in model.items() if not r["uploaded"])
        if pending:
            flipped = store.mark_uploaded(
                spark.createDataFrame([(pending[0],)], ["email"])
            )
            assert flipped == 1
            model[pending[0]]["uploaded"] = True

    final = {r["email"]: r for r in store.read().collect()}
    assert set(final) == set(model)
    for e, want_row in model.items():
        got = final[e]
        for key in ("id", "first_name", "phone", "uploaded"):
            assert got[key] == want_row[key], (e, key, got[key], want_row[key])
    # both UNIQUE constraints hold
    ids = [r["id"] for r in final.values()]
    assert len(ids) == len(set(ids))
