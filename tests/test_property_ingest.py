"""Property-based invariants of the ingest path (hypothesis): for ANY
input rows, validate_split partitions the input exactly (no row lost, no
row duplicated), clean rows satisfy the contract, and dedupe produces
key-unique output that is a subset of its input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_crm_upload_spark.operators.dedup import dedupe_batch
from csv_crm_upload_spark.operators.validate import validate_split
from csv_crm_upload_spark.schemas import CUSTOMER_CSV_SCHEMA

# spark fixture is session-scoped; hypothesis re-runs the test body many
# times inside ONE test call, so suppress the fixture health check.
_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

text_or_none = st.one_of(st.none(), st.text(max_size=12))
id_like = st.one_of(
    st.integers(-(2**40), 2**40).map(str),  # valid
    st.text(max_size=8),  # usually invalid
    st.none(),
)
row = st.tuples(id_like, text_or_none, text_or_none, text_or_none, text_or_none)


@given(rows=st.lists(row, max_size=25))
@settings(**_SETTINGS)
def test_validate_split_partitions_input(spark, rows):
    raw = spark.createDataFrame(
        [(*r, None) for r in rows], schema=CUSTOMER_CSV_SCHEMA
    )
    clean, quarantine = validate_split(raw)
    n_clean, n_q = clean.count(), quarantine.count()
    assert n_clean + n_q == len(rows)  # exact partition

    for r in clean.collect():
        assert r["id"] is not None  # parsed long
        assert r["email"] is not None and r["email"].strip() != ""
    for r in quarantine.collect():
        assert r["reason"] in {"malformed_line", "bad_id", "empty_email"}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),  # narrow id space forces collisions
            st.sampled_from(["a@x.com", "b@x.com", "c@x.com"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_dedupe_batch_properties(spark, rows):
    df = spark.createDataFrame(
        [(i, "f", "l", e, "p") for i, e in rows],
        ["id", "first_name", "last_name", "email", "phone"],
    )
    out = dedupe_batch(df)
    got = [(r["id"], r["email"]) for r in out.collect()]
    # key-uniqueness on BOTH keys
    assert len({g[0] for g in got}) == len(got)
    assert len({g[1] for g in got}) == len(got)
    # subset of input
    assert set(got) <= set(rows)
    # determinism: same input → same output
    again = [(r["id"], r["email"]) for r in dedupe_batch(df).collect()]
    assert sorted(got) == sorted(again)
