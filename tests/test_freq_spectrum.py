"""Word-frequency spectrum (operators/ngrams.word_frequency_spectrum)."""

from __future__ import annotations

from pathik_spark.operators.ngrams import word_frequency_spectrum


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def _spectrum(spark, texts):
    return {
        r.k_bucket: (r.n_types, r.n_tokens)
        for r in word_frequency_spectrum(_docs(spark, texts)).collect()
    }


def test_hand_counted_buckets(spark):
    # a:1 (k=0), b:2, c:3 (k=1), d:5 (k=2)
    got = _spectrum(spark, ["a b c d d", "b c c d d d"])
    assert got == {0: (1, 1), 1: (2, 5), 2: (1, 5)}


def test_exact_power_of_two_boundaries(spark):
    # counts 1, 2, 4, 8 land in buckets 0, 1, 2, 3 exactly
    texts = ["x", "y y", "z z z z", "w w w w w w w w"]
    got = _spectrum(spark, texts)
    assert got == {0: (1, 1), 1: (1, 2), 2: (1, 4), 3: (1, 8)}


def test_normalization_case_folds(spark):
    # Word and word are ONE type of count 2 -> bucket 1
    got = _spectrum(spark, ["Word word"])
    assert got == {1: (1, 2)}


def test_empty_and_whitespace_texts_contribute_nothing(spark):
    got = _spectrum(spark, ["", "   ", "solo"])
    assert got == {0: (1, 1)}


def test_token_mass_is_conserved(spark):
    texts = ["the cat sat on the mat", "the dog sat"]
    got = _spectrum(spark, texts)
    assert sum(t for _, t in got.values()) == 9
