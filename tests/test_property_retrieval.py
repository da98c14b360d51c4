"""Property-based check of the distributed BM25 against a pure-Python
reference implementation: for ANY small corpus and query set, the Spark
plan (explode + tf/df aggregations + broadcast query join) must produce
the same scores as the textbook sequential formula."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_crm_upload_spark.analytics import retrieval as rtr

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["spark", "join", "scan", "table", "row", "fast", "x", "y"]
doc_text = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc_text, min_size=1, max_size=8)
query_terms = st.lists(st.sampled_from(WORDS), min_size=1, max_size=3, unique=True)


def bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Sequential textbook BM25 (Lucene +1 idf), scores rounded to 4."""
    docs = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    n = len(docs)
    if n == 0:
        return {}
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {}
    for toks in docs.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    out = {}
    for i, toks in docs.items():
        dl = len(toks)
        s = 0.0
        hit = False
        for w in set(terms):
            tf = toks.count(w)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if hit:
            out[i] = round(s, 4)
    return out


@given(texts=corpus, terms=query_terms)
@settings(**_SETTINGS)
def test_bm25_matches_sequential_reference(spark, texts, terms):
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r.doc_id: r.bm25
        for r in rtr.bm25_scores(docs, {0: list(terms)}).collect()
    }
    want = bm25_reference(texts, terms)
    assert got.keys() == want.keys()
    for i in got:
        assert math.isclose(got[i], want[i], abs_tol=1e-3), (i, got[i], want[i])
