"""Politeness scheduler (B4/W1/W2/W4) vs the sequential ordering oracle
(SURVEY.md §5.2.3, §7-H2), plus salted-top-k equivalence (H3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.frontier import prepare_frontier
from pathik_spark.operators.robots import attach_robots, filter_disallowed
from pathik_spark.operators.scheduler import schedule_round, select_within_budget
from pathik_spark.oracle import simulate_round


def _candidates(spark, corpus):
    fr = prepare_frontier(corpus["seeds"])
    return filter_disallowed(attach_robots(fr, corpus["robots"]))


def _oracle(corpus_pd, **kw):
    seeds = corpus_pd["seeds"].to_dict("records")
    robots = {
        r["host"]: {
            "crawl_delay_ms": r["crawl_delay_ms"],
            "max_per_round": r["max_per_round"],
            "disallow_prefixes": list(r["disallow_prefixes"]),
        }
        for r in corpus_pd["robots"].to_dict("records")
    }
    return simulate_round(seeds, robots, **kw)


@pytest.mark.parametrize("global_period_ms", [None, 1000])
def test_order_matches_oracle(spark, corpus, corpus_pd, global_period_ms):
    cands = _candidates(spark, corpus)
    scheduled, _ = schedule_round(cands, global_period_ms=global_period_ms)
    got = [
        (r["crawl_order"], r["url"], r["scheduled_ms"])
        for r in scheduled.select("crawl_order", "url", "scheduled_ms")
        .orderBy("crawl_order")
        .collect()
    ]
    expected = _oracle(corpus_pd, global_period_ms=global_period_ms)
    exp = [(o["rank"], o["url"], o["scheduled_ms"]) for o in expected.order]
    assert got == exp


def test_seen_set_matches_oracle(spark, corpus, corpus_pd):
    cands = _candidates(spark, corpus)
    scheduled, deferred = schedule_round(cands)
    expected = _oracle(corpus_pd)
    got_seen = {r["url"] for r in scheduled.select("url").collect()}
    assert got_seen == expected.seen
    got_deferred = {r["url"] for r in deferred.select("url").collect()}
    assert got_deferred == set(expected.deferred)


def test_budget_respected(spark, corpus):
    cands = _candidates(spark, corpus)
    scheduled, _ = schedule_round(cands)
    over = (
        scheduled.groupBy("host")
        .agg(F.count("*").alias("n"), F.max("max_per_round").alias("cap"))
        .filter(F.col("n") > F.col("cap"))
        .count()
    )
    assert over == 0


def test_salted_topk_equivalent(spark, corpus):
    cands = _candidates(spark, corpus)
    direct = select_within_budget(cands, n_salts=0)
    salted = select_within_budget(cands, n_salts=7)
    key = lambda df: {
        (r["url"], r["rank_in_host"], r["desired_ms"])
        for r in df.select("url", "rank_in_host", "desired_ms").collect()
    }
    assert key(direct) == key(salted)


def test_scalable_rank_equals_single_window(spark, corpus):
    cands = _candidates(spark, corpus)
    fast, _ = schedule_round(cands, scalable_rank=True)
    slow, _ = schedule_round(cands, scalable_rank=False)
    key = lambda df: [
        (r["crawl_order"], r["url"])
        for r in df.select("crawl_order", "url").orderBy("crawl_order").collect()
    ]
    assert key(fast) == key(slow)


def test_crawl_delay_spacing(spark, corpus):
    cands = _candidates(spark, corpus)
    scheduled, _ = schedule_round(cands)
    bad = scheduled.filter(
        F.col("scheduled_ms") != (F.col("rank_in_host") - 1) * F.col("crawl_delay_ms")
    ).count()
    assert bad == 0
