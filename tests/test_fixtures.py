"""Generator equivalence: the distributed corpus generator must produce
byte-identical tables to the sequential one, and generation must be
deterministic across calls."""

from __future__ import annotations

from pathik_spark.fixtures import gen_corpus, write_corpus_spark


def test_spark_generator_matches_sequential(spark, tmp_path):
    n_pages, n_seeds = 300, 40
    out = str(tmp_path / "spark_corpus")
    write_corpus_spark(spark, n_pages, n_seeds, out)
    seq = gen_corpus(n_pages, n_seeds)

    pages_d = (
        spark.read.parquet(f"{out}/pages.parquet").toPandas().sort_values("url").reset_index(drop=True)
    )
    pages_s = seq["pages"].sort_values("url").reset_index(drop=True)
    assert list(pages_d["url"]) == list(pages_s["url"])
    assert list(pages_d["text"]) == list(pages_s["text"])
    assert [bytes(b) for b in pages_d["html"]] == [bytes(b) for b in pages_s["html"]]
    assert list(pages_d["lang"]) == list(pages_s["lang"])

    links_d = sorted(
        map(tuple, spark.read.parquet(f"{out}/links.parquet").toPandas().values.tolist())
    )
    links_s = sorted(map(tuple, seq["links"].values.tolist()))
    assert links_d == links_s

    seeds_d = spark.read.parquet(f"{out}/seeds.parquet").toPandas().sort_values("seq")
    assert list(seeds_d["url"]) == list(seq["seeds"]["url"])

    robots_d = spark.read.parquet(f"{out}/robots.parquet").toPandas().sort_values("host").reset_index(drop=True)
    robots_s = seq["robots"].sort_values("host").reset_index(drop=True)
    assert list(robots_d["crawl_delay_ms"]) == list(robots_s["crawl_delay_ms"])


def test_generation_is_deterministic():
    a = gen_corpus(120, 20)
    b = gen_corpus(120, 20)
    assert a["pages"].equals(b["pages"])
    assert a["links"].equals(b["links"])
    assert a["seeds"].equals(b["seeds"])
