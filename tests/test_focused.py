"""Focused-crawl frontier scoring (operators/focused)."""

from __future__ import annotations

from pyspark.sql import Row

from pathik_spark.operators.focused import focused_frontier_scores


def _run(spark, anchors, topic):
    a = spark.createDataFrame(
        [Row(dst_url=d, anchor=t) for d, t in anchors],
        "dst_url string, anchor string",
    )
    t = spark.createDataFrame(topic, "term string, weight_micro bigint")
    return {
        r["url"]: (
            r["anchor_score_micro"],
            r["url_score_micro"],
            r["n_hit_inlinks"],
            r["score_micro"],
        )
        for r in focused_frontier_scores(a, t).collect()
    }


def test_hand_computed_scores(spark):
    topic = [("spark", 100), ("dedup", 80)]
    got = _run(
        spark,
        [
            # two identical boilerplate inlinks + one topical: the
            # boilerplate tokenizes once but weights by multiplicity 2
            ("https://h/a", "read more"),
            ("https://h/a", "read more"),
            ("https://h/a", "Spark dedup guide"),
            # repetition inside one anchor counts every occurrence
            ("https://h/b", "spark spark SPARK"),
            # url-token channel only (path carries the term)
            ("https://h/spark-intro", "click here"),
            # nothing matches anywhere
            ("https://h/c", "kittens"),
            # empty anchor is an inlink but never a hit
            ("https://h/c", ""),
        ],
        topic,
    )
    assert got["https://h/a"] == (180, 0, 1, 180)
    assert got["https://h/b"] == (300, 0, 1, 300)
    assert got["https://h/spark-intro"] == (0, 100, 0, 100)
    assert got["https://h/c"] == (0, 0, 0, 0)


def test_multiplicity_of_matching_boilerplate(spark):
    # three inlinks sharing a MATCHING anchor: score and hit count
    # both scale with multiplicity
    got = _run(
        spark,
        [("https://h/x", "spark tips")] * 3,
        [("spark", 10)],
    )
    assert got["https://h/x"] == (30, 0, 3, 30)


def test_host_tokens_do_not_score(spark):
    # the term appears in the HOST, not the path: url channel is 0
    got = _run(
        spark,
        [("https://spark.example/page", "hello")],
        [("spark", 10)],
    )
    assert got["https://spark.example/page"] == (0, 0, 0, 0)
