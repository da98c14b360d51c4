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


# ---- PII redaction invariants -------------------------------------------

_word = st.text(alphabet="abcdefghijklmnop qrstuvwxyz", min_size=0, max_size=20)
_email = st.builds(
    lambda u, d: f"{u}@{d}.example",
    st.text(alphabet="abcdefghij0123456789._", min_size=1, max_size=10).filter(
        lambda s: s.strip("._") == s and s != ""
    ),
    st.text(alphabet="abcdefghij", min_size=1, max_size=8),
)
_phone = st.builds(
    lambda a, b, c: f"+{a}-{b}-{c}",
    st.integers(1, 99),
    st.integers(100, 999),
    st.integers(1000, 9999),
)


@given(
    docs=st.lists(
        st.tuples(_word, st.lists(st.one_of(_email, _phone), max_size=3), _word),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_redaction_removes_all_pii(spark, docs):
    """For ANY text with planted emails/phones: the redacted output
    contains no match of either pattern, and the per-row counts equal the
    number of planted items of each kind."""
    import re

    from csv_crm_upload_spark.analytics.textstats import EMAIL_RE, PHONE_RE, t5_redact_pii

    rows = []
    for i, (pre, pii, post) in enumerate(docs):
        text = pre + " " + " ".join(pii) + " " + post
        n_e = sum("@" in p for p in pii)
        n_p = len(pii) - n_e
        rows.append((i, text, n_e, n_p))
    df = spark.createDataFrame(rows, ["doc_id", "text", "want_e", "want_p"])
    out = {r["doc_id"]: r for r in t5_redact_pii(df.select("doc_id", "text")).collect()}
    for i, text, want_e, want_p in rows:
        r = out[i]
        assert re.search(EMAIL_RE, r["redacted"]) is None
        assert re.search(PHONE_RE, r["redacted"]) is None
        assert r["n_emails"] >= want_e  # planted ones all caught
        assert r["n_phones"] >= want_p
