"""DSIR importance resampling (operators/dsir.py): hashed n-gram
features, feature LMs, importance weights, deterministic Gumbel-top-k."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import dsir as D


@pytest.fixture(scope="module")
def pool(spark):
    # 3 "target-like" docs, 3 off-distribution docs
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox naps under the warm sun"),
        (2, "a quick brown dog jumps over the lazy fox"),
        (3, "zzz qqq xxx www vvv kkk jjj"),
        (4, "lorem ipsum dolor sit amet consectetur"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_hashed_ngram_feature_counts(spark):
    df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    feats = D.hashed_ngram_features(df, n_buckets=1 << 20).collect()
    # grams: a, b, a, 'a b', 'b a' -> total count 5; 'a' collides with
    # itself (cnt 2), the rest are singletons at this bucket width
    assert sum(r["cnt"] for r in feats) == 5
    assert sorted(r["cnt"] for r in feats) == [1, 1, 1, 2]
    assert all(0 <= r["bucket"] < (1 << 20) for r in feats)


def test_hashed_ngram_empty_doc_emits_nothing(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one")], "doc_id long, text string"
    )
    feats = D.hashed_ngram_features(df, n_buckets=64)
    assert feats.filter(F.col("doc_id") < 2).count() == 0
    assert feats.filter(F.col("doc_id") == 2).count() == 1  # unigram only


def test_train_feature_lm_probabilities(spark):
    # one doc "x y": grams x, y, 'x y' -> 3 observed grams; with add-one
    # smoothing over n_buckets=64: total_mass = 3 + 64
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    lm = D.train_feature_lm(df, n_buckets=64).collect()
    assert len(lm) <= 3  # hash collisions can only merge buckets
    total = sum(round(10 ** (r["logp_micro"] / 1e6) * (3 + 64)) for r in lm)
    assert total == 3 + len(lm)  # (cnt+1) per observed bucket
    assert all(r["total_mass"] == 67 for r in lm)


def test_dsir_weights_favor_target_like_docs(spark, pool):
    target = pool.filter(F.col("doc_id") <= 2)
    t_lm = D.train_feature_lm(target, 512)
    q_lm = D.train_feature_lm(pool, 512)
    w = {r["doc_id"]: r for r in D.dsir_log_weights(pool, t_lm, q_lm, 512).collect()}
    # every target-like doc outweighs every off-distribution doc
    assert min(w[i]["logw"] for i in (0, 1, 2)) > max(w[i]["logw"] for i in (3, 4))
    # empty doc is neutral
    assert w[5]["n_grams"] == 0 and w[5]["logw"] == 0.0
    # logw is the micro sum divided out
    for r in w.values():
        assert math.isclose(r["logw"], round(r["logw_micro"] / 1e6, 6), abs_tol=1e-9)


def test_dsir_select_deterministic_and_partition_independent(spark, pool):
    target = pool.filter(F.col("doc_id") <= 2)
    sel1 = D.dsir_select(pool.repartition(1), target, k=3, n_buckets=512)
    sel7 = D.dsir_select(pool.repartition(7), target, k=3, n_buckets=512)
    rows1 = sorted((r["doc_id"], r["key_micro"]) for r in sel1.collect())
    rows7 = sorted((r["doc_id"], r["key_micro"]) for r in sel7.collect())
    assert rows1 == rows7
    assert len(rows1) == 3


def test_dsir_select_respects_k_and_orders_by_key(spark, pool):
    target = pool.filter(F.col("doc_id") <= 2)
    out = D.dsir_select(pool, target, k=4, n_buckets=512).collect()
    keys = [r["key_micro"] for r in out]
    assert keys == sorted(keys, reverse=True)
    assert len(out) == 4


def test_gumbel_key_is_salt_dependent(spark, pool):
    a = pool.select("doc_id", D.gumbel_key_micro("doc_id", salt="s1").alias("g"))
    b = pool.select("doc_id", D.gumbel_key_micro("doc_id", salt="s2").alias("g"))
    ga = {r["doc_id"]: r["g"] for r in a.collect()}
    gb = {r["doc_id"]: r["g"] for r in b.collect()}
    assert any(ga[k] != gb[k] for k in ga)
