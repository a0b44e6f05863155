"""CrawlRun(learn_dust=True): DUST rules mined from round-k artifacts
strip later rounds' discovered seeds (plans/driver.py wiring)."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from pathik_spark.config import CrawlConfig
from pathik_spark.fixtures import (
    LINKS_SCHEMA,
    PAGES_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
)
from pathik_spark.plans.driver import CrawlRun

H = "https://d.example"
TS = datetime(2025, 3, 28, tzinfo=timezone.utc)


def _page(url, body):
    html = f"<html><head><title>t</title></head><body><p>{body}</p></body></html>"
    return (url, TS, html.encode(), body, "en")


def _tables(spark):
    pages = [
        # sid is dust: per path, every sid variant serves the same body
        _page(f"{H}/a?sid=1", "alpha content"),
        _page(f"{H}/a?sid=2", "alpha content"),
        _page(f"{H}/b?sid=1", "beta content"),
        _page(f"{H}/b?sid=2", "beta content"),
        # the stripped forms a crawler would fetch after learning
        _page(f"{H}/a", "alpha content"),
        _page(f"{H}/b", "beta content"),
    ]
    seeds = [
        (f"{H}/a?sid=1", 0, 0),
        (f"{H}/a?sid=2", 1, 0),
        (f"{H}/b?sid=1", 2, 0),
        (f"{H}/b?sid=2", 3, 0),
    ]
    # round-1 discoveries: fresh dust variants of both paths
    links = [
        (f"{H}/a?sid=1", f"{H}/a?sid=9"),
        (f"{H}/b?sid=1", f"{H}/b?sid=7"),
    ]
    robots = [("d.example", 0, [], 100, TS)]
    return {
        "pages": spark.createDataFrame(
            pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"]),
            schema=PAGES_SCHEMA,
        ),
        "seeds": spark.createDataFrame(
            pd.DataFrame(seeds, columns=["url", "seq", "priority"]),
            schema=SEEDS_SCHEMA,
        ),
        "links": spark.createDataFrame(
            pd.DataFrame(links, columns=["src_url", "dst_url"]),
            schema=LINKS_SCHEMA,
        ),
        "robots": spark.createDataFrame(
            pd.DataFrame(
                robots,
                columns=[
                    "host", "crawl_delay_ms", "disallow_prefixes",
                    "max_per_round", "fetched_ts",
                ],
            ),
            schema=ROBOTS_SCHEMA,
        ),
    }


def test_learned_rules_strip_next_round(spark, tmp_path):
    t = _tables(spark)
    run = CrawlRun(
        spark,
        pages=t["pages"],
        robots=t["robots"],
        links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="dust", learn_dust=True),
    )
    run.run(t["seeds"], n_rounds=2)
    assert ("d.example", "sid") in run._dust_rules
    arts1 = spark.read.parquet(
        str(tmp_path / "dust" / "round=1" / "artifacts.parquet")
    )
    urls1 = {r.url for r in arts1.select("url").collect()}
    # the discovered sid variants were stripped to the bare paths —
    # which the seen filter then dropped? no: /a and /b themselves were
    # never crawled in round 0 (only their sid variants), so they fetch
    assert f"{H}/a" in urls1 and f"{H}/b" in urls1
    assert not any("sid=9" in u or "sid=7" in u for u in urls1)


def _tables_3groups(spark, c2_body):
    """min_groups=3 scenario: round 0 contributes 2 collapsing groups
    (/a, /b), round 1 discovers the third (/c) whose collapse is
    controlled by ``c2_body`` — evidence must MERGE across rounds
    before a rule can form, and a counterexample in the third group
    must veto it."""
    pages = [
        _page(f"{H}/a?sid=1", "alpha content"),
        _page(f"{H}/a?sid=2", "alpha content"),
        _page(f"{H}/b?sid=1", "beta content"),
        _page(f"{H}/b?sid=2", "beta content"),
        _page(f"{H}/c?sid=1", "gamma content"),
        _page(f"{H}/c?sid=2", c2_body),
    ]
    seeds = [
        (f"{H}/a?sid=1", 0, 0),
        (f"{H}/a?sid=2", 1, 0),
        (f"{H}/b?sid=1", 2, 0),
        (f"{H}/b?sid=2", 3, 0),
    ]
    links = [
        (f"{H}/a?sid=1", f"{H}/c?sid=1"),
        (f"{H}/b?sid=1", f"{H}/c?sid=2"),
    ]
    robots = [("d.example", 0, [], 100, TS)]
    t = _tables(spark)
    t["pages"] = spark.createDataFrame(
        pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=PAGES_SCHEMA,
    )
    t["seeds"] = spark.createDataFrame(
        pd.DataFrame(seeds, columns=["url", "seq", "priority"]),
        schema=SEEDS_SCHEMA,
    )
    t["links"] = spark.createDataFrame(
        pd.DataFrame(links, columns=["src_url", "dst_url"]),
        schema=LINKS_SCHEMA,
    )
    t["robots"] = spark.createDataFrame(
        pd.DataFrame(
            robots,
            columns=[
                "host", "crawl_delay_ms", "disallow_prefixes",
                "max_per_round", "fetched_ts",
            ],
        ),
        schema=ROBOTS_SCHEMA,
    )
    return t


def test_evidence_merges_across_rounds(spark, tmp_path):
    # no single round reaches min_groups=3; the merged totals do
    t = _tables_3groups(spark, "gamma content")
    run = CrawlRun(
        spark,
        pages=t["pages"], robots=t["robots"], links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="dustmerge", learn_dust=True,
                           dust_min_groups=3),
    )
    run.run(t["seeds"], n_rounds=2)
    groups = run._dust_evidence[("d.example", "sid")]
    assert len(groups) == 3 and all(groups.values())
    assert ("d.example", "sid") in run._dust_rules


def test_counterexample_group_vetoes_rule(spark, tmp_path):
    # the third group serves two DIFFERENT bodies for its sid variants:
    # merged totals read tested=3 collapsed=2, so no rule forms even
    # though every round's own evidence was all-collapsed or neutral
    t = _tables_3groups(spark, "gamma DIFFERENT")
    run = CrawlRun(
        spark,
        pages=t["pages"], robots=t["robots"], links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="dustveto", learn_dust=True,
                           dust_min_groups=3),
    )
    run.run(t["seeds"], n_rounds=2)
    groups = run._dust_evidence[("d.example", "sid")]
    assert len(groups) == 3 and sum(groups.values()) == 2
    assert run._dust_rules == set()


def test_without_learning_variants_refetch(spark, tmp_path):
    t = _tables(spark)
    run = CrawlRun(
        spark,
        pages=t["pages"],
        robots=t["robots"],
        links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="nodust", learn_dust=False),
    )
    run.run(t["seeds"], n_rounds=2)
    assert run._dust_rules == set()
    arts1 = spark.read.parquet(
        str(tmp_path / "nodust" / "round=1" / "artifacts.parquet")
    )
    urls1 = {r.url for r in arts1.select("url").collect()}
    # the dust variants burn fetch budget (status missing — not in the
    # pages table — but they were scheduled as distinct URLs)
    assert any("sid=9" in u for u in urls1)


def test_counterexample_first_still_vetoes(spark, tmp_path):
    """Order-independence: the counterexample group is observed in
    ROUND 0 (before any supporting evidence exists); rounds then add
    collapsing groups. Totals-based merging would have discarded the
    early counterexample (not yet a candidate, not yet known) and
    formed a false rule from the later support — group-level evidence
    must keep the veto."""
    pages = [
        # round 0 fetches the counterexample group + one collapsing one
        _page(f"{H}/c?sid=1", "gamma content"),
        _page(f"{H}/c?sid=2", "gamma DIFFERENT"),
        _page(f"{H}/a?sid=1", "alpha content"),
        _page(f"{H}/a?sid=2", "alpha content"),
        # round 1 discovers a second collapsing group
        _page(f"{H}/b?sid=1", "beta content"),
        _page(f"{H}/b?sid=2", "beta content"),
    ]
    seeds = [
        (f"{H}/c?sid=1", 0, 0), (f"{H}/c?sid=2", 1, 0),
        (f"{H}/a?sid=1", 2, 0), (f"{H}/a?sid=2", 3, 0),
    ]
    links = [
        (f"{H}/a?sid=1", f"{H}/b?sid=1"),
        (f"{H}/a?sid=2", f"{H}/b?sid=2"),
    ]
    robots = [("d.example", 0, [], 100, TS)]
    t = {
        "pages": spark.createDataFrame(
            pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"]),
            schema=PAGES_SCHEMA,
        ),
        "seeds": spark.createDataFrame(
            pd.DataFrame(seeds, columns=["url", "seq", "priority"]),
            schema=SEEDS_SCHEMA,
        ),
        "links": spark.createDataFrame(
            pd.DataFrame(links, columns=["src_url", "dst_url"]),
            schema=LINKS_SCHEMA,
        ),
        "robots": spark.createDataFrame(
            pd.DataFrame(
                robots,
                columns=[
                    "host", "crawl_delay_ms", "disallow_prefixes",
                    "max_per_round", "fetched_ts",
                ],
            ),
            schema=ROBOTS_SCHEMA,
        ),
    }
    run = CrawlRun(
        spark,
        pages=t["pages"], robots=t["robots"], links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="dustorder", learn_dust=True,
                           dust_min_groups=2),
    )
    run.run(t["seeds"], n_rounds=2)
    groups = run._dust_evidence[("d.example", "sid")]
    assert len(groups) == 3 and sum(groups.values()) == 2
    assert run._dust_rules == set()


def test_refetched_group_counts_once(spark, tmp_path):
    """A single collapsing group re-observed across rounds (TTL
    re-admission path simulated by feeding the same URLs as both seeds
    and discovered links) contributes ONE distinct group — totals-based
    merging would have reached min_groups=2 from one group seen twice."""
    pages = [
        _page(f"{H}/a?sid=1", "alpha content"),
        _page(f"{H}/a?sid=2", "alpha content"),
    ]
    seeds = [(f"{H}/a?sid=1", 0, 0), (f"{H}/a?sid=2", 1, 0)]
    links = []
    robots = [("d.example", 0, [], 100, TS)]
    t = {
        "pages": spark.createDataFrame(
            pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"]),
            schema=PAGES_SCHEMA,
        ),
        "seeds": spark.createDataFrame(
            pd.DataFrame(seeds, columns=["url", "seq", "priority"]),
            schema=SEEDS_SCHEMA,
        ),
        "links": spark.createDataFrame(
            pd.DataFrame(links, columns=["src_url", "dst_url"]),
            schema=LINKS_SCHEMA,
        ),
        "robots": spark.createDataFrame(
            pd.DataFrame(
                robots,
                columns=[
                    "host", "crawl_delay_ms", "disallow_prefixes",
                    "max_per_round", "fetched_ts",
                ],
            ),
            schema=ROBOTS_SCHEMA,
        ),
    }
    run = CrawlRun(
        spark,
        pages=t["pages"], robots=t["robots"], links=t["links"],
        state_dir=str(tmp_path),
        config=CrawlConfig(run_id="dustonce", learn_dust=True,
                           dust_min_groups=2),
    )
    run.run(t["seeds"], n_rounds=2)
    # simulate a second session re-mining the same group (the refetch
    # shape): merge the same group-level evidence again by hand
    ev_before = {k: dict(v) for k, v in run._dust_evidence.items()}
    for key, groups in ev_before.items():
        for gk, collapsed in groups.items():
            g = run._dust_evidence.setdefault(key, {})
            g[gk] = g.get(gk, True) and collapsed
    groups = run._dust_evidence[("d.example", "sid")]
    assert len(groups) == 1  # still one distinct group
    assert ("d.example", "sid") not in run._dust_rules  # 1 < min_groups
