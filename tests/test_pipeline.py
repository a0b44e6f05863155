"""End-to-end flagship pipeline (SURVEY.md §3.1 replacement): multi-round
crawl over the synthetic corpus with retries, discovery, metrics and
checkpoint/resume (B5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.config import CrawlConfig
from pathik_spark.plans.driver import CrawlRun


def _run(spark, corpus, tmp_path, run_id, **cfg_kw):
    cfg = CrawlConfig(run_id=run_id, **cfg_kw)
    return CrawlRun(
        spark,
        pages=corpus["pages"],
        robots=corpus["robots"],
        links=corpus["links"],
        state_dir=str(tmp_path),
        config=cfg,
    )


def test_single_round_end_to_end(spark, corpus, corpus_pd, tmp_path):
    run = _run(spark, corpus, tmp_path, "r1", n_rounds=1)
    stats = run.run(corpus["seeds"], n_rounds=1)
    assert len(stats) == 1
    st = stats[0]
    assert st.fetched > 0
    assert st.scheduled == st.fetched + st.missing
    arts = run.store.read_table(0, "artifacts")
    # byte-identity through the whole pipeline: fetched rows carry the
    # golden text (join back against pages on canonical identity)
    golden = corpus["pages"].select(F.col("url").alias("gurl"), F.col("text").alias("golden"))
    from pathik_spark.functions.urls import canonicalize_udf

    g = golden.withColumn("gurl", canonicalize_udf(F.col("gurl")))
    fetched = arts.filter(F.col("status") == "fetched")
    bad = fetched.join(g, fetched.url == g.gurl, "left").filter(
        (F.col("golden").isNull()) | (F.col("text") != F.col("golden"))
    )
    assert bad.count() == 0


def test_disallowed_never_fetched(spark, corpus, tmp_path):
    run = _run(spark, corpus, tmp_path, "r2", n_rounds=2)
    run.run(corpus["seeds"], n_rounds=2)
    robots_pd = run.robots.toPandas()
    blocked_hosts = set(
        robots_pd[robots_pd["disallow_prefixes"].map(len) > 0]["host"]
    )
    for k in (0, 1):
        arts = run.store.read_table(k, "artifacts")
        leaked = arts.filter(
            F.col("host").isin(blocked_hosts) & F.col("url").contains("/private")
        ).count()
        assert leaked == 0


def test_multi_round_discovery_and_retry(spark, corpus, tmp_path):
    # bloom_min_seen=0 forces the bloom-sharded seen path through the driver
    run = _run(spark, corpus, tmp_path, "r3", n_rounds=3, max_attempts=2, bloom_min_seen=0)
    stats = run.run(corpus["seeds"], n_rounds=3)
    assert len(stats) >= 2
    assert stats[0].discovered > 0
    # a url scheduled in round 0 must never be scheduled again (seen set)
    seen_urls: set[str] = set()
    for st in stats:
        arts = run.store.read_table(st.round, "artifacts")
        urls = {r["url"] for r in arts.select("url").collect()}
        # retried 'missing' rows are allowed to reappear once (attempt+1)
        fetched_prev = seen_urls
        refetched = {
            r["url"]
            for r in arts.filter(F.col("status") == "fetched").select("url").collect()
        } & fetched_prev
        assert not refetched
        seen_urls |= {
            r["url"]
            for r in arts.filter(
                (F.col("status") == "fetched") | (F.col("attempt") + 1 >= 2)
            ).select("url").collect()
        }
        del urls


def test_resume_equals_uninterrupted(spark, corpus, tmp_path):
    # uninterrupted 2-round run
    run_a = _run(spark, corpus, tmp_path, "ra", n_rounds=2)
    run_a.run(corpus["seeds"], n_rounds=2)
    # interrupted: run 1 round, then a fresh CrawlRun resumes round 1
    run_b1 = _run(spark, corpus, tmp_path, "rb", n_rounds=2)
    run_b1.run(corpus["seeds"], n_rounds=1)
    run_b2 = _run(spark, corpus, tmp_path, "rb", n_rounds=2)
    run_b2.run(corpus["seeds"], n_rounds=2, resume=True)

    for table in ("artifacts", "seen", "next_frontier"):
        a = run_a.store.read_table(1, table)
        b = run_b2.store.read_table(1, table)
        cols = sorted(a.columns)
        ra = sorted(map(tuple, a.select(*cols).collect()))
        rb = sorted(map(tuple, b.select(*cols).collect()))
        assert ra == rb, table


def test_metrics_and_lineage_written(spark, corpus, tmp_path):
    run = _run(spark, corpus, tmp_path, "r4", n_rounds=1)
    run.run(corpus["seeds"], n_rounds=1)
    hm = run.store.read_table(0, "host_metrics")
    assert hm.filter(F.col("n_urls") <= 0).count() == 0
    assert {"run_id", "round", "host_hash", "n_fetched", "bytes_fetched"} <= set(hm.columns)
    lin = run.store.read_table(0, "lineage")
    assert lin.count() > 0
    total = lin.agg(F.sum("n_rows")).collect()[0][0]
    arts = run.store.read_table(0, "artifacts")
    assert total == arts.count()


def test_eager_commit_equals_deferred(spark, corpus, tmp_path):
    """config.eager_commit publishes each round's manifest before the
    next round starts (durability over commit/compute overlap) and must
    not change any produced table or stat."""
    import json

    run_d = _run(spark, corpus, tmp_path / "d", "rc", n_rounds=2)
    stats_d = run_d.run(corpus["seeds"], n_rounds=2)
    run_e = _run(spark, corpus, tmp_path / "e", "rc", n_rounds=2, eager_commit=True)
    stats_e = run_e.run(corpus["seeds"], n_rounds=2)
    for sd, se in zip(stats_d, stats_e):
        assert (sd.scheduled, sd.fetched, sd.seen_total) == (
            se.scheduled, se.fetched, se.seen_total
        )
    for k in (0, 1):
        with open(tmp_path / "e" / "rc" / f"round={k}" / "manifest.json") as f:
            assert json.load(f)["stats"]["scheduled"] == stats_e[k].scheduled
        a = run_d.store.read_table(k, "artifacts")
        b = run_e.store.read_table(k, "artifacts")
        cols = sorted(a.columns)
        assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
            map(tuple, b.select(*cols).collect())
        )


def test_raw_robots_txt_input_equals_rules_table(spark, corpus, corpus_pd, tmp_path):
    """CrawlRun accepts raw robots.txt bodies: rendering the fixture's
    rules as robots.txt text and letting the driver parse them yields
    the identical round (same stats, same scheduled URL set) as the
    pre-parsed rules table (max_per_round omitted from both so the
    comparison isolates the parser)."""
    rules = corpus["robots"].select("host", "crawl_delay_ms", "disallow_prefixes")
    texts = []
    for r in corpus_pd["robots"].itertuples():
        lines = ["User-agent: pathik", f"Crawl-delay: {r.crawl_delay_ms / 1000.0}"]
        lines += [f"Disallow: {p}" for p in r.disallow_prefixes]
        texts.append((r.host, "\n".join(lines)))
    raw = spark.createDataFrame(texts, ["host", "robots_txt"])

    runs = {}
    for name, robots in (("table", rules), ("text", raw)):
        run = CrawlRun(
            spark,
            pages=corpus["pages"],
            robots=robots,
            links=corpus["links"],
            state_dir=str(tmp_path / name),
            config=CrawlConfig(run_id=f"rt-{name}"),
        )
        stats = run.run(corpus["seeds"], n_rounds=1)
        arts = run.store.read_table(0, "artifacts")
        runs[name] = (
            stats[0].scheduled,
            stats[0].fetched,
            {r["url"] for r in arts.select("url").collect()},
        )
    assert runs["table"] == runs["text"]
