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


def test_frontier_from_scores_tiers_and_seeds_contract(spark):
    from pyspark.sql import Row

    from pathik_spark.operators.focused import frontier_from_scores

    scores = spark.createDataFrame(
        [
            Row(url="https://h/top", score_micro=100),
            Row(url="https://h/mid", score_micro=50),
            Row(url="https://h/low", score_micro=1),
            Row(url="https://h/zero", score_micro=0),
        ],
        "url string, score_micro bigint",
    )
    got = {
        r["url"]: r["priority"]
        for r in frontier_from_scores(scores, n_tiers=8).collect()
    }
    assert got["https://h/top"] == 0
    assert got["https://h/mid"] == 3
    assert got["https://h/zero"] == 7
    assert 0 < got["https://h/low"] <= 6
    # the seeds contract feeds the crawl loop directly
    from pathik_spark.operators.frontier import prepare_frontier

    fr = prepare_frontier(
        frontier_from_scores(scores, n_tiers=8)
    )
    assert {"url", "seq", "priority"} <= set(fr.columns)
    # all-zero scores: everything lands in the last tier, not div/0
    zeros = spark.createDataFrame(
        [Row(url="https://h/a", score_micro=0)],
        "url string, score_micro bigint",
    )
    assert frontier_from_scores(zeros).collect()[0]["priority"] == 7


def test_focused_plan_broadcasts_topic_no_cartesian_blowup(spark):
    import contextlib
    import io

    from pyspark.sql import Row

    from pathik_spark.operators.focused import focused_frontier_scores

    a = spark.createDataFrame(
        [Row(dst_url=f"https://h/{i}", anchor=f"spark tip {i}") for i in range(50)],
        "dst_url string, anchor string",
    )
    t = spark.createDataFrame([("spark", 10)], "term string, weight_micro bigint")
    df = focused_frontier_scores(a, t)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # term joins and the 1-row term-set join are all broadcast;
    # nothing data-sized nested-loops
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
