"""Similarity search over the embeddings table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import ann as A

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


def test_brute_force_topk_matches_numpy(spark, emb):
    import numpy as np

    pdf = emb.toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = A.brute_force_topk(emb, queries, k=5)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"]) for r in out.collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    for qid in range(3):
        qv = vecs[ids == qid][0]
        scores = vecs @ qv / (norms * np.linalg.norm(qv))
        order = sorted(
            [(round(s, 6), int(i)) for s, i in zip(scores, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rank, (s, i) in enumerate(order, start=1):
            gv, gs = got[(qid, rank)]
            assert gv == i and math.isclose(gs, s, abs_tol=2e-6), (qid, rank)


def test_lsh_topk_subset_quality(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = A.brute_force_topk(emb, queries, k=10)
    approx = A.lsh_bucketed_topk(emb, queries, k=10, n_planes=4, dim=64)
    # recall@10 against exact — LSH with 4 planes on 500 vecs should catch some
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert a, "lsh returned nothing"
    recall = len(e & a) / len(e)
    assert recall > 0.1, f"recall {recall}"
    # every approx hit must carry the exact cosine score
    scored = {(r["query_id"], r["vec_id"]): r["score"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["vec_id"])
        if key in scored:
            assert abs(scored[key] - r["score"]) < 1e-9


def test_lsh_bucket_udf_matches_numpy(spark, emb):
    """The UDF's buckets equal a direct numpy computation with the same
    deterministic hyperplanes (replayability of the SRP bucketing)."""
    import numpy as np

    got = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", A.make_lsh_bucket_udf(6, 64)(F.col("embedding")).alias("b")
        ).collect()
    }
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    signs = (mat @ A.hyperplanes(6, 64).T) >= 0.0
    weights = (1 << np.arange(5, -1, -1)).astype(np.int64)
    expected = dict(zip(pdf["vec_id"].tolist(), (signs @ weights).astype(int).tolist()))
    assert got == expected


def test_lsh_wide_dim_no_plan_blowup(spark, emb):
    """dim=768 runs through the matmul bucketing with a constant-size
    plan (the round-1 expression form inlined ~4,600 terms here)."""
    wide = emb.select(
        "vec_id", F.flatten(F.array_repeat(F.col("embedding"), 12)).alias("embedding")
    )
    queries = wide.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = A.lsh_bucketed_topk(wide, queries, k=5, n_planes=8, dim=768)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, f"plan unexpectedly large: {len(plan)} chars"
    assert out.count() > 0


def test_near_dup_pairs_symmetric_threshold(spark, emb):
    sub = emb.filter(F.col("vec_id") < 60)
    pairs = A.embedding_near_dup_pairs(sub, threshold=0.5, exact=True)
    rows = pairs.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["score"] >= 0.5


def test_ivf_centroids_deterministic_and_normalized(spark, emb):
    import numpy as np

    c1 = A.ivf_centroids(emb, n_centroids=8, dim=64, n_iters=2)
    c2 = A.ivf_centroids(emb, n_centroids=8, dim=64, n_iters=2)
    assert np.array_equal(c1, c2)  # no RNG state anywhere
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_assignment_covers_all_centroid_cells(spark, emb):
    cents = A.ivf_centroids(emb, n_centroids=8, dim=64)
    assigned = emb.select(
        A.make_ivf_assign_udf(cents, 1)(F.col("embedding")).alias("cid")
    )
    cids = {r["cid"] for r in assigned.distinct().collect()}
    assert cids <= set(range(8))
    assert len(cids) >= 4  # the fixture corpus is not degenerate


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in A.brute_force_topk(emb, queries, k=10).collect()
    }
    # full probe = exact within re-ranked cells covering everything
    full = A.ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8)
    assert {(r["query_id"], r["vec_id"]) for r in full.collect()} == exact
    # partial probe trades recall for compute but keeps a floor
    part = A.ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=3)
    got = {(r["query_id"], r["vec_id"]) for r in part.collect()}
    recall = len(got & exact) / len(exact)
    assert recall > 0.5, f"recall {recall}"


def test_ivf_probe_join_broadcasts_queries(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = A.ivf_centroids(emb, n_centroids=8, dim=64)
    out = A.ivf_topk(emb, queries, k=5, centroids=cents, n_centroids=8, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the corpus side never shuffles for the probe


def test_semdedup_chain_keeps_lowest_id(spark):
    # three near-identical vectors + one far-away: the chain collapses
    # to its lowest id, the outlier survives regardless of cluster
    base = [1.0] + [0.0] * 63
    tweak = [0.999] + [0.001] * 63
    tweak2 = [0.998] + [0.002] * 63
    far = [0.0] * 32 + [1.0] + [0.0] * 31
    df = spark.createDataFrame(
        [(0, base), (1, tweak), (2, tweak2), (7, far)],
        "vec_id long, embedding array<double>",
    )
    out = A.semdedup_keep(df, threshold=0.95, n_planes=4, dim=64)
    keep = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert keep[0] is True
    assert keep[1] is False and keep[2] is False
    assert keep[7] is True


def test_semdedup_threshold_above_one_keeps_all(spark, emb):
    sub = emb.filter(F.col("vec_id") < 40)
    out = A.semdedup_keep(sub, threshold=1.01)
    assert out.count() == 40
    assert out.filter(~F.col("keep")).count() == 0


def test_semdedup_dropped_subset_of_exact_pairs(spark, emb):
    # LSH clustering only REMOVES candidate pairs vs the exact
    # all-pairs graph, so the dropped set is a subset of exact id_b's
    sub = emb.filter(F.col("vec_id") < 80)
    dropped = {
        r["vec_id"]
        for r in A.semdedup_keep(sub, threshold=0.3).filter(~F.col("keep")).collect()
    }
    exact_b = {
        r["id_b"]
        for r in A.embedding_near_dup_pairs(sub, threshold=0.3, exact=True).collect()
    }
    assert dropped <= exact_b


def test_semdedup_centroid_arm_respects_clusters(spark):
    # two well-separated groups, each containing a duplicate pair: the
    # k-means arm must drop one per group, never across groups
    a = [1.0] + [0.0] * 63
    a2 = [0.999] + [0.001] * 63
    b = [0.0] * 63 + [1.0]
    b2 = [0.001] * 63 + [0.999]
    df = spark.createDataFrame(
        [(0, a), (1, a2), (10, b), (11, b2)],
        "vec_id long, embedding array<double>",
    )
    cents = A.ivf_centroids(df, n_centroids=2, dim=64)
    out = A.semdedup_keep(df, threshold=0.95, centroids=cents)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[0]["keep"] is True and rows[1]["keep"] is False
    assert rows[10]["keep"] is True and rows[11]["keep"] is False
    assert rows[0]["cluster"] != rows[10]["cluster"]


# ---- JL random projection ---------------------------------------------------


def test_projection_matrix_achlioptas_shape(spark):
    import numpy as np

    from pathik_spark.operators.ann import projection_matrix

    m = projection_matrix(16, 64)
    assert m.shape == (64, 16)
    c = np.sqrt(3.0 / 16)
    vals = set(np.unique(np.round(np.abs(m), 12)))
    assert vals <= {0.0, round(c, 12)}          # only 0 and +/- sqrt(3/k)
    frac_zero = float((m == 0.0).mean())
    assert 0.5 < frac_zero < 0.8                 # ~2/3 sparse
    assert (projection_matrix(16, 64) == m).all()  # deterministic


def test_random_projection_preserves_distances(spark):
    import numpy as np

    from pathik_spark.operators.ann import random_projection

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: np.array(r["embedding"]) for r in
           random_projection(df, out_dim=32, dim=64).collect()}
    assert all(len(v) == 32 for v in out.values())
    # JL: norms preserved in expectation; check a tolerant band pairwise
    ratios = []
    for i in range(0, 20, 2):
        d_orig = np.linalg.norm(vecs[i] - vecs[i + 1])
        d_proj = np.linalg.norm(out[i] - out[i + 1])
        ratios.append(d_proj / d_orig)
    assert 0.6 < min(ratios) and max(ratios) < 1.5
    assert abs(np.mean(ratios) - 1.0) < 0.2


def test_random_projection_ann_recall_composition(spark):
    """The intended composition: project 64 -> 24 dims, run brute-force
    cosine top-k in the reduced space, compare against full-space
    ground truth — JL distortion should keep recall high."""
    import numpy as np

    from pathik_spark.operators.ann import brute_force_topk, random_projection

    rng = np.random.default_rng(11)
    base = rng.standard_normal((8, 64))
    vecs = []
    for i in range(80):
        v = base[i % 8] + 0.15 * rng.standard_normal(64)
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 4").selectExpr("vec_id AS query_id", "embedding")

    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    reduced = random_projection(df, out_dim=24, dim=64)
    red_q = reduced.filter("vec_id < 4").selectExpr("vec_id AS query_id", "embedding")
    approx = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(reduced, red_q, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, recall
