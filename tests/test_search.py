"""BM25 retrieval + TF-IDF keyword extraction (operators/search.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.search import (
    bm25_postings,
    bm25_topk,
    query_terms,
    tfidf_top_terms,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple apple apple durian"),
        (3, ""),  # never indexed
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_and_dl(tiny):
    post = {(r["tok"], r["doc_id"]): (r["tf"], r["dl"]) for r in bm25_postings(tiny).collect()}
    assert post[("apple", 0)] == (2, 3)
    assert post[("banana", 1)] == (1, 2)
    assert post[("durian", 2)] == (1, 4)
    assert not any(d == 3 for _, d in post)  # empty doc absent


def test_query_terms_distinct_and_normalized(spark):
    q = spark.createDataFrame(
        [(7, "  Apple   APPLE banana ")], "query_id long, query string"
    )
    got = {(r["query_id"], r["tok"]) for r in query_terms(q).collect()}
    assert got == {(7, "apple"), (7, "banana")}


def test_bm25_matches_hand_formula(spark, tiny):
    q = spark.createDataFrame([(1, "apple")], "query_id long, query string")
    got = {r["doc_id"]: r for r in bm25_topk(tiny, q, k=10).collect()}
    # index: 3 docs, dl 3/2/4, avgdl = 3.0; df(apple) = 2
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def w(tf, dl):
        return round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)) * 1e6) / 1e6

    assert set(got) == {0, 2}
    assert got[0]["score"] == pytest.approx(round(w(2, 3), 6), abs=1e-9)
    assert got[2]["score"] == pytest.approx(round(w(3, 4), 6), abs=1e-9)
    # tf=3 outranks tf=2 even with the longer doc here
    assert got[2]["rnk"] == 1 and got[0]["rnk"] == 2


def test_bm25_salted_equals_unsalted(spark, docs):
    q = spark.createDataFrame(
        [(1, "spark join order"), (2, "customer query fast")],
        "query_id long, query string",
    )
    plain = bm25_topk(docs, q, k=8).collect()
    salted = bm25_topk(docs, q, k=8, n_salts=7).collect()
    key = lambda r: (r["query_id"], r["rnk"])
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    assert len({key(r) for r in plain}) == len(plain) == 16


def test_bm25_scores_monotone_within_query(docs, spark):
    q = spark.createDataFrame([(1, "hash table scan")], "query_id long, query string")
    rows = sorted(bm25_topk(docs, q, k=10).collect(), key=lambda r: r["rnk"])
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_tfidf_top_terms_rank_and_universal_term(tiny):
    out = tfidf_top_terms(tiny, n_terms=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: apple (3/4)*ln(3/2)=0.304 outranks its unique durian (1/4)*ln(3)=0.275
    top2 = sorted(by_doc[2], key=lambda r: r["rnk"])
    assert [r["tok"] for r in top2] == ["apple", "durian"]
    assert top2[0]["tfidf"] == pytest.approx(round(round(0.75 * math.log(1.5) * 1e6) / 1e6, 6), abs=1e-9)
    assert top2[1]["tfidf"] == pytest.approx(round(round(0.25 * math.log(3.0) * 1e6) / 1e6, 6), abs=1e-9)
    assert all(r["tfidf"] >= 0 for r in out)


def test_bm25_plan_has_broadcasts_and_no_cartesian(docs, spark):
    q = spark.createDataFrame([(1, "spark join")], "query_id long, query string")
    plan = bm25_topk(docs, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_search_corpus_facade(spark, docs):
    import pathik_spark

    out = pathik_spark.search_corpus(docs, ["spark join order", "customer"], k=5)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "query", "doc_id", "score", "rnk"}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2}
    assert all(len(v) == 5 for v in by_q.values())
    # duplicate query strings stay distinguishable via query_id
    dup = pathik_spark.search_corpus(docs, ["customer", "customer"], k=3)
    assert dup.select("query_id").distinct().count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pathik_spark.search_corpus(docs, [])
    with _pytest.raises(ValueError):
        pathik_spark.search_corpus(docs, ["ok", "  "])
