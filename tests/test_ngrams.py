"""Corpus n-gram statistics (operators/ngrams.py)."""

from __future__ import annotations

import pytest

from pathik_spark.operators.ngrams import (
    boilerplate_ngrams,
    ngram_counts,
    ngram_doc_frequency,
    top_ngrams,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "the cat sat the cat sat"),   # 'the cat' twice IN ONE doc
        (1, "the cat ran"),
        (2, "a dog ran"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_counts_multiset_vs_doc_frequency(tiny):
    counts = {r["gram"]: r["count"] for r in ngram_counts(tiny, n=2).collect()}
    dfreq = {r["gram"]: r["df"] for r in ngram_doc_frequency(tiny, n=2).collect()}
    assert counts["the cat"] == 3   # multiset: 2 in doc 0 + 1 in doc 1
    assert dfreq["the cat"] == 2    # but only 2 docs contain it
    assert counts["cat sat"] == 2 and dfreq["cat sat"] == 1
    assert counts["dog ran"] == 1


def test_top_ngrams_order_and_ties(tiny):
    rows = top_ngrams(tiny, n=2, k=3).collect()
    assert [r["rnk"] for r in rows] == [1, 2, 3]
    assert rows[0]["gram"] == "the cat" and rows[0]["count"] == 3
    assert rows[1]["gram"] == "cat sat" and rows[1]["count"] == 2
    # count-1 ties break lexicographically: 'a dog' < 'cat ran' < 'dog ran' < 'sat the'
    assert rows[2]["gram"] == "a dog" and rows[2]["count"] == 1


def test_boilerplate_ngrams_threshold(tiny):
    # 4 docs; min_doc_frac=0.5 -> df >= 2: only 'the cat'
    out = boilerplate_ngrams(tiny, n=2, min_doc_frac=0.5).collect()
    assert [(r["gram"], r["df"], r["doc_frac"]) for r in out] == [("the cat", 2, 0.5)]


def test_top_ngrams_plan_is_take_ordered(spark, tiny):
    plan = top_ngrams(tiny, n=2, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global Sort of the gram table
