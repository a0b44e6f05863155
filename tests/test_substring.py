"""Exact substring dedup (operators/substring.py): Lee-et-al-style
duplicated-span detection + removal, shuffle-engine shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.substring import (
    duplicated_spans,
    ngram_position_hashes,
    strip_duplicated_spans,
)

BOILER = "all rights reserved contact us terms of service apply here now"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, f"alpha beta gamma {BOILER} delta epsilon"),
            (2, f"one two three four {BOILER} five six"),
            (3, "totally unique text with no duplicated spans whatsoever in it"),
            (4, ""),
            (5, f"{BOILER} {BOILER} tail"),
            (6, "short doc"),
        ],
        "doc_id long, text string",
    )


def test_ngram_positions_cover_every_window(spark, docs):
    g = ngram_position_hashes(docs, n=5).toPandas()
    # doc 1 has 16 tokens -> 12 5-gram positions, 0..11
    d1 = g[g.doc_id == 1]
    assert sorted(d1.pos) == list(range(12))
    # empty and too-short docs emit nothing
    assert g[g.doc_id.isin([4, 6])].empty
    # identical grams hash identically across docs (the whole point)
    d2 = g[g.doc_id == 2]
    assert set(d1.gram_hash) & set(d2.gram_hash)


def test_duplicated_spans_merge_and_bounds(spark, docs):
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=5, min_count=2).collect()
    }
    # the 11-token boilerplate occupies tokens 3..13 of doc 1, 4..14 of doc 2
    assert spans[1] == (3, 14)
    assert spans[2] == (4, 15)
    # doc 5's tandem repeat merges into ONE span over both copies
    assert spans[5] == (0, 22)
    assert 3 not in spans and 4 not in spans and 6 not in spans


def test_within_doc_repeats_count(spark):
    # min_count=2 satisfied by two occurrences inside the SAME doc
    docs = spark.createDataFrame(
        [(1, "p q r s t u filler p q r s t u"), (2, "other words here only once")],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, n=6, min_count=2).collect()
    assert {r["doc_id"] for r in spans} == {1}


def test_strip_removes_exactly_the_spans(spark, docs):
    spans = duplicated_spans(docs, n=5, min_count=2)
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, spans).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert out[1]["n_removed_tokens"] == 11
    assert out[2]["clean_text"] == "one two three four five six"
    assert out[3]["n_removed_tokens"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed_tokens"] == 0
    assert out[5]["clean_text"] == "tail" and out[5]["n_removed_tokens"] == 22
    # every doc emits exactly one row
    assert set(out) == {1, 2, 3, 4, 5, 6}


def test_keep_one_policy_via_span_exemption(spark, docs):
    """The keep-one-occurrence (Lee et al.) policy is a join on the
    spans table: exempting one doc's spans keeps its copy intact."""
    spans = duplicated_spans(docs, n=5, min_count=2)
    # exempt the lowest doc_id carrying any span: its copy stays intact
    keep_doc = spans.agg(F.min("doc_id")).collect()[0][0]
    pruned = spans.filter(F.col("doc_id") != keep_doc)
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, pruned).collect()}
    # doc 1 was exempted for the (3,14) span -> its text survives intact
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["n_removed_tokens"] == 11


def test_portable_and_fast_hash_arms_agree(spark, docs):
    """Spans are hash-agnostic: the production xxhash64 arm and the
    DuckDB-portable md5 arm flag identical spans."""
    fast = sorted(map(tuple, duplicated_spans(docs, n=5, portable=False).collect()))
    port = sorted(map(tuple, duplicated_spans(docs, n=5, portable=True).collect()))
    assert fast == port


def test_randomized_equality_with_python_reference(spark):
    """40 random small-vocab docs (dup n-grams arise naturally): the
    distributed spans/strip must equal a brute-force pure-Python
    reference."""
    import random

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for d in range(40)
    }
    n = 3
    # python reference: global 3-gram counts -> positions -> merged spans
    toks = {d: t.split() if t else [] for d, t in texts.items()}
    counts: dict[tuple, int] = {}
    for d, ts in toks.items():
        for p in range(len(ts) - n + 1):
            g = tuple(ts[p : p + n])
            counts[g] = counts.get(g, 0) + 1
    want_spans = set()
    for d, ts in toks.items():
        pos = [
            p for p in range(len(ts) - n + 1)
            if counts[tuple(ts[p : p + n])] >= 2
        ]
        spans, cur = [], None
        for p in pos:
            if cur is not None and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + n))
            else:
                if cur:
                    spans.append(cur)
                cur = (p, p + n)
        if cur:
            spans.append(cur)
        for s, e in spans:
            want_spans.add((d, s, e))

    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got_spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=n, min_count=2).collect()
    }
    assert got_spans == want_spans

    # strip equality
    covered = {d: set() for d in texts}
    for d, s, e in want_spans:
        covered[d].update(range(s, e))
    want_clean = {
        d: " ".join(t for i, t in enumerate(ts) if i not in covered[d])
        for d, ts in toks.items()
    }
    got_clean = {
        r["doc_id"]: r["clean_text"]
        for r in strip_duplicated_spans(
            docs, duplicated_spans(docs, n=n, min_count=2)
        ).collect()
    }
    assert got_clean == want_clean


def test_no_python_udf_in_plan(spark, docs):
    spans = duplicated_spans(docs, n=5, min_count=2)
    plan = strip_duplicated_spans(docs, spans)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_duplicated_spans_plan_shape(spark, docs):
    """The scale contract: exactly 3 exchanges (grams->join, partial-
    agg'd counts->join, doc_id window), the islands groupBy reuses the
    window's doc_id partitioning, no Python, no cartesian."""
    plan = (
        duplicated_spans(docs, n=5, min_count=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 3, plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
