"""Product quantization: codebooks, encoding, ADC search (operators/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import ann as A
from pathik_spark.operators import pq as PQ

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_codebooks_shape_and_determinism(emb):
    b1 = PQ.pq_codebooks(emb, n_subspaces=8, n_codes=16, dim=64)
    b2 = PQ.pq_codebooks(emb, n_subspaces=8, n_codes=16, dim=64)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2), "training must be deterministic"


def test_codebooks_reject_bad_dim(emb):
    with pytest.raises(ValueError, match="divisible"):
        PQ.pq_codebooks(emb, n_subspaces=7, n_codes=16, dim=64)


def test_codebooks_clamp_small_corpus(spark):
    tiny = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(3)], "vec_id long, embedding array<float>"
    )
    books = PQ.pq_codebooks(tiny, n_subspaces=2, n_codes=16, dim=8)
    assert books.shape == (2, 16, 4)  # padded to rectangular


def test_encode_codes_in_range(emb):
    books = PQ.pq_codebooks(emb, n_subspaces=8, n_codes=16, dim=64)
    enc = PQ.pq_encode(emb, books).collect()
    assert len(enc) == emb.count()
    for r in enc:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_encode_argmin_matches_numpy(emb):
    """Spark-side encode == a straight numpy argmin on the same books."""
    books = PQ.pq_codebooks(emb, n_subspaces=8, n_codes=16, dim=64)
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    got = {
        r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(emb, books).collect()
    }
    for row, vid in zip(mat, pdf["vec_id"].to_numpy()):
        want = []
        for s in range(8):
            sub = row[s * 8 : (s + 1) * 8]
            d = np.sum((books[s] - sub) ** 2, axis=1)
            want.append(int(np.argmin(d)))
        assert got[int(vid)] == want, int(vid)


def test_adc_exact_limit_equals_brute_force(emb, queries):
    """rerank=True + n_candidates >= corpus: the full PQ machinery runs
    but the result is exactly brute-force top-k — the oracle arm."""
    n = emb.count()
    exact = A.brute_force_topk(emb, queries, k=5)
    got = PQ.pq_adc_topk(
        emb, queries, k=5, n_subspaces=8, n_codes=16, n_candidates=n, rerank=True
    )
    e = sorted(map(tuple, exact.collect()))
    g = sorted(map(tuple, got.collect()))
    assert e == g


def test_adc_real_budget_recall_floor(emb, queries):
    exact = A.brute_force_topk(emb, queries, k=10)
    got = PQ.pq_adc_topk(
        emb, queries, k=10, n_subspaces=8, n_codes=32, n_candidates=80, rerank=True
    )
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    assert g, "pq returned nothing"
    recall = len(e & g) / len(e)
    assert recall >= 0.5, f"recall {recall}"
    # reranked scores are exact cosines: every shared hit carries the
    # same score as brute force
    es = {(r["query_id"], r["vec_id"]): r["score"] for r in exact.collect()}
    for r in got.collect():
        key = (r["query_id"], r["vec_id"])
        if key in es:
            assert abs(es[key] - r["score"]) < 2e-6


def test_adc_compressed_only_scores_are_adc(emb, queries):
    """rerank=False never reads float vectors after encode; scores are
    the ADC approximation (monotone ranking, not exact cosine)."""
    got = PQ.pq_adc_topk(
        emb, queries, k=5, n_subspaces=8, n_codes=16, n_candidates=40, rerank=False
    ).collect()
    assert len(got) == 5 * 5
    for r in got:
        assert r["vec_id"] != r["query_id"]
        assert -1.5 <= r["score"] <= 1.5  # ~cosine range (quantization slack)


def test_adc_empty_queries(emb, spark):
    q = spark.createDataFrame([], "query_id long, embedding array<float>")
    assert PQ.pq_adc_topk(emb, q, k=5).count() == 0
