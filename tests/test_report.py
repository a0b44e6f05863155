"""Tests for the corpus composition report (operators/report.py) and the
crawl driver's blocklist integration."""

from __future__ import annotations

from pathik_spark.operators.report import corpus_report


def test_corpus_report_rollup(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "web", "alpha beta gamma"),
            (2, "en", "web", "Alpha   BETA gamma"),  # dup after normalization
            (3, "en", "web", "delta"),
            (4, "fr", "web", ""),
            (5, "fr", "books", "un deux trois quatre"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    got = {(r["lang"], r["source"]): r.asDict() for r in corpus_report(docs).collect()}
    en = got[("en", "web")]
    assert (en["n_docs"], en["n_tokens"], en["n_distinct"]) == (3, 7, 2)
    assert abs(en["dup_rate"] - (1 - 2 / 3)) < 1e-6
    assert abs(en["avg_tokens"] - 7 / 3) < 1e-6
    assert en["n_chars"] == len("alpha beta gamma") + len("Alpha   BETA gamma") + len("delta")
    fr = got[("fr", "web")]
    assert (fr["n_docs"], fr["n_tokens"], fr["dup_rate"]) == (1, 0, 0.0)
    assert got[("fr", "books")]["n_tokens"] == 4


def test_crawlrun_blocklist_drops_hosts(spark, corpus, tmp_path):
    from pathik_spark.config import CrawlConfig
    from pathik_spark.plans.driver import CrawlRun
    from pathik_spark.functions.urls import hostname_of
    import pyspark.sql.functions as F

    hosts = [
        r["h"]
        for r in corpus["seeds"]
        .select(hostname_of(F.col("url")).alias("h"))
        .distinct()
        .limit(2)
        .collect()
    ]
    bl = spark.createDataFrame([(h,) for h in hosts], "host string")
    run = CrawlRun(
        spark,
        pages=corpus["pages"],
        robots=corpus["robots"],
        links=corpus["links"],
        state_dir=str(tmp_path / "bl"),
        config=CrawlConfig(run_id="bl", n_salts=2),
        blocklist=bl,
    )
    stats = run.run(corpus["seeds"], n_rounds=1)
    arts = spark.read.parquet(str(tmp_path / "bl" / "bl" / "round=0" / "artifacts.parquet"))
    crawled_hosts = {r["host"] for r in arts.select("host").distinct().collect()}
    assert crawled_hosts, "crawl produced no artifacts"
    assert not (crawled_hosts & set(hosts))
    assert stats[0].scheduled > 0
