"""Property-based invariants of span-level dedup (linedd1): for ANY
corpus, (1) total kept spans across the corpus equals the number of
DISTINCT span keys (each key survives exactly once), (2) every doc's
kept text is a subsequence of its normalized original, and (3) the
lowest-doc_id holder of each span key keeps it."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_crm_upload_spark.analytics.dedup import linedd1_span_dedup

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word = st.sampled_from(["alpha", "beta", "gamma", "delta", "the", "spark"])
doc_text = st.lists(word, min_size=1, max_size=24).map(" ".join)


@given(texts=st.lists(doc_text, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_span_dedup_invariants(spark, texts):
    span = 4
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = {r["doc_id"]: r for r in linedd1_span_dedup(docs, span=span).collect()}

    # reference model: python replay of the same span cut
    spans_by_doc = {}
    for i, t in enumerate(texts):
        toks = t.split()
        spans_by_doc[i] = [
            tuple(toks[s : s + span]) for s in range(0, len(toks), span)
        ]
    distinct_keys = {k for spans in spans_by_doc.values() for k in spans}

    assert sum(r["n_kept_spans"] for r in out.values()) == len(distinct_keys)
    seen: set[tuple[str, ...]] = set()
    for i in sorted(spans_by_doc):
        expect_kept = [k for k in spans_by_doc[i] if k not in seen and not seen.add(k)]
        # not seen.add(k) keeps first occurrence WITHIN the doc too
        expected_text = " ".join(w for k in expect_kept for w in k)
        assert out[i]["cleaned_text"] == expected_text, (i, texts)
        assert out[i]["n_spans"] == len(spans_by_doc[i])
