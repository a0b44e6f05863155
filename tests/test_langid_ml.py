"""Trained NB language identification (operators/langid_ml.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import langid_ml as L

# three synthetic "languages" with disjoint character distributions
_WORDS = {
    "aa": ["alpha", "amber", "apple", "arena", "atlas"],
    "bb": ["bravo", "birch", "blaze", "bloom", "brook"],
    "cc": ["cedar", "coral", "crisp", "cycle", "czech"],
}


def _mk_doc(lang: str, i: int) -> str:
    ws = _WORDS[lang]
    return " ".join(ws[(i + j) % len(ws)] for j in range(12))


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (lang_i * 100 + i, _mk_doc(lang, i), lang)
        for lang_i, lang in enumerate(_WORDS)
        for i in range(8)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_char_ngram_features_hand_count(spark):
    df = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    feats = L.char_ngram_features(df, n=3, n_buckets=1 << 20).collect()
    # trigrams: abc, bcd -> 2 grams, distinct buckets at this width
    assert sum(r["cnt"] for r in feats) == 2
    assert len(feats) == 2


def test_char_ngram_short_doc_emits_nothing(spark):
    df = spark.createDataFrame([(0, "ab"), (1, "")], "doc_id long, text string")
    assert L.char_ngram_features(df, n=3).count() == 0


def test_langid_nb_recovers_labels(spark, labeled):
    model = L.train_langid_nb(labeled, n_buckets=2048)
    pred = L.langid_nb_predict(labeled, model, n_buckets=2048)
    joined = pred.join(labeled.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    correct = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    assert n == 24 and correct == 24  # disjoint charsets -> perfect


def test_langid_nb_margin_positive_and_scores_complete(spark, labeled):
    model = L.train_langid_nb(labeled, n_buckets=2048)
    scores = L.langid_nb_scores(labeled, model, n_buckets=2048)
    # full lattice: every doc scored against every class
    assert scores.count() == 24 * 3
    pred = L.langid_nb_predict(labeled, model, n_buckets=2048)
    assert pred.filter(F.col("margin_micro") <= 0).count() == 0


def test_langid_nb_partitioning_independent(spark, labeled):
    model = L.train_langid_nb(labeled, n_buckets=512)
    a = L.langid_nb_predict(labeled.repartition(1), model, n_buckets=512)
    b = L.langid_nb_predict(labeled.repartition(7), model, n_buckets=512)
    ra = sorted((r["doc_id"], r["pred_lang"], r["score_micro"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["pred_lang"], r["score_micro"]) for r in b.collect())
    assert ra == rb


def test_langid_nb_model_is_broadcast_in_scoring_plan(spark, labeled):
    model = L.train_langid_nb(labeled, n_buckets=512)
    plan = (
        L.langid_nb_scores(labeled, model, n_buckets=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_langid_nb_unseen_charset_gets_floor_scores(spark, labeled):
    # a doc made of characters no class ever saw: all classes score it
    # with priors + floors only, so argmax falls to the largest prior /
    # lexicographic tie-break — and the margin reflects only priors
    model = L.train_langid_nb(labeled, n_buckets=2048)
    mystery = spark.createDataFrame([(999, "zzz qqq xxx www")], "doc_id long, text string")
    scores = {r["lang"]: r["score_micro"] for r in L.langid_nb_scores(mystery, model, n_buckets=2048).collect()}
    assert len(scores) == 3
    pred = L.langid_nb_predict(mystery, model, n_buckets=2048).collect()[0]
    assert pred["pred_lang"] == min(scores, key=lambda k: (-scores[k], k))
