"""PCA family: covariance vs numpy, orthonormal loadings, map-only
projection plan, full-rank rotation invariance, recall floor on planted
low-rank data."""

from __future__ import annotations

import io
import re

import numpy as np

from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.pca import (
    fit_pca,
    pca1_covariance,
    pca2_projected_knn,
    pca_project,
)
from csv_crm_upload_spark.analytics.similarity import knn_bruteforce
from csv_crm_upload_spark.sources.tables import load_table


def _emb_df(spark, mat: np.ndarray):
    rows = [
        (i, [float(x) for x in mat[i]], int(i % 3)) for i in range(mat.shape[0])
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_covariance_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {(r["i"], r["j"]): r["cov"] for r in pca1_covariance(emb).collect()}
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    mat = np.round(mat, 9)
    want = np.cov(mat, rowvar=False)  # ddof=1, matching (n-1)
    d = mat.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-4, (i, j, v, want[i, j])


def test_loadings_are_orthonormal(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    loadings, eigvals = fit_pca(emb, r=8)
    w = np.array(loadings)
    assert w.shape[0] == 8
    assert np.allclose(w @ w.T, np.eye(8), atol=1e-8)
    assert eigvals == sorted(eigvals, reverse=True)
    assert all(v >= -1e-9 for v in eigvals)  # covariance PSD
    # deterministic sign convention: max-|w| entry positive
    for row in w:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_is_map_only(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    loadings, _ = fit_pca(emb, r=4)
    df = pca_project(emb, loadings)
    buf = io.StringIO()
    import contextlib

    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert not re.search(r"(?<!Broadcast)Exchange", buf.getvalue()), (
        "projection must ride the scan with zero shuffles"
    )


def test_full_rank_projection_preserves_ranking(spark):
    """r = d is a pure rotation — cosine similarities are preserved, so
    the projected kNN must return the same neighbors in the same order
    (planted well-separated clusters keep the ranking away from 6-dp
    rounding boundaries)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 5.0
    mat = np.vstack([centers[i % 4] + rng.normal(size=8) * 0.05 for i in range(60)])
    df = _emb_df(spark, mat)
    full = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in knn_bruteforce(df, query_ids=[0, 1, 2], k=5).collect()
    ]
    proj = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pca2_projected_knn(df, r=8, query_ids=[0, 1, 2], k=5).collect()
    ]
    assert sorted(full) == sorted(proj)


def test_recall_floor_on_planted_low_rank(spark):
    """Data with 3 latent directions + tiny noise in 32 dims: projecting
    to r=4 must keep ≥ 80% of each query's true top-5 (the case PCA
    exists for; uniform random data would have no axis to find)."""
    rng = np.random.default_rng(11)
    basis = rng.normal(size=(3, 32))
    coef = rng.normal(size=(80, 3))
    mat = coef @ basis + rng.normal(size=(80, 32)) * 0.01
    df = _emb_df(spark, mat)
    qids = [0, 1, 2, 3]
    truth = {}
    for r in knn_bruteforce(df, query_ids=qids, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in pca2_projected_knn(df, r=4, query_ids=qids, k=5).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(truth[q] & got[q]) / 5 for q in qids]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
