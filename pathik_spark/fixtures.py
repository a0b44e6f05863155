"""Deterministic synthetic crawl corpus (FIXTURES.md schemas, seed=42).

Generates the ``pages / seeds / robots / links`` tables as pure functions
of (seed, row index) — no wall clock, no network. The ``pages.text``
column is the *golden* extraction output produced by the normative kernel
(pathik_spark.kernels.extract), so the Spark UDF byte-identity invariant
is checkable end-to-end (SURVEY.md §5.2).

Scale knob ``n_pages``: 2,000 for pytest, 60,000 for bench.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from pathik_spark.kernels.extract import extract_text

SEED = 42
EPOCH = datetime(2025, 3, 1, 0, 0, 0, tzinfo=timezone.utc)

WORDS = (
    "crawl frontier spark page host robot delay budget queue shard bloom "
    "hash url fetch extract convert markdown article content link graph "
    "batch round snapshot resume metric lineage partition shuffle skew "
    "token bucket politeness schedule priority seed anchor header footer"
).split()

LANG_CYCLE = ("de", "fr", "ja")


def _host_weights(n_hosts: int, s: float = 1.2) -> list[float]:
    weights = [1.0 / (k + 1) ** s for k in range(n_hosts)]
    total = sum(weights)
    return [w / total for w in weights]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _article_paragraphs(rng: random.Random, n_paras: int, words_per: int) -> str:
    return "\n".join(
        f"<p>{_sentence(rng, words_per)} <strong>{rng.choice(WORDS)}</strong> "
        f"{_sentence(rng, 4)} <em>{rng.choice(WORDS)}</em>.</p>"
        for _ in range(n_paras)
    )


def _links_block(urls: list[str]) -> str:
    items = "".join(f'<li><a href="{u}">link {i}</a></li>' for i, u in enumerate(urls))
    return f'<ul class="links">{items}</ul>'


def _page_html(
    rng: random.Random, page_id: int, title: str, outlinks: list[str], page_scale: int = 1
) -> bytes:
    """Templated HTML covering the reference's heuristic boundaries.

    ``page_scale`` multiplies the medium-article body size: scale 1 keeps
    the FIXTURES.md pytest corpus (~5-10 KB pages); bench corpora use a
    larger scale so page weight approximates real Common-Crawl documents
    (~40-80 KB) and per-URL compute dominates per-task overhead."""
    stratum = page_id % 100
    nav = (
        "<nav><a href='/'>home</a> <a href='/about'>about</a></nav>"
        "<header><h1>site header boilerplate</h1></header>"
    )
    footer = "<footer><p>copyright boilerplate footer text</p></footer>"
    links = _links_block(outlinks)

    if stratum == 15:  # empty body
        return b"<html><head><title>empty</title></head><body></body></html>"
    if stratum == 16:  # malformed: unclosed tags
        body = f"<div><p>{_sentence(rng, 30)}<p>{_sentence(rng, 25)}<em>{_sentence(rng, 5)}"
        return f"<html><head><title>{title}</title><body>{nav}<article>{body}".encode()
    if stratum == 17:  # non-utf8 byte sequence embedded in the binary column
        body = f"<article><p>{_sentence(rng, 40)} café {_sentence(rng, 10)}</p></article>"
        raw = f"<html><head><title>{title}</title></head><body>{nav}{body}{footer}</body></html>"
        return raw.encode("utf-8").replace(b"caf\xc3\xa9", b"caf\xe9")  # latin-1 e9
    if 10 <= stratum < 12:  # no-article: pure boilerplate
        return f"<html><head><title>{title}</title></head><body>{nav}{footer}</body></html>".encode()
    if 12 <= stratum < 15:  # markdown-stress
        body = (
            f"<article><h1>{title}</h1>"
            f"<p>{_sentence(rng, 20)} &amp; entities &#x27;quoted&#x27;</p>"
            f"<ul><li>alpha {rng.choice(WORDS)}</li><li>beta<ul><li>nested {rng.choice(WORDS)}</li></ul></li></ul>"
            f"<ol><li>first</li><li>second</li></ol>"
            f"<blockquote><p>{_sentence(rng, 12)}</p></blockquote>"
            f"<pre>code_block(x) = {page_id}\n  indent kept</pre>"
            f"<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>"
            f"<p>mixed scripts: 日本語 ümläut</p></article>"
        )
    elif stratum < 10:  # tiny page: keep < 5000 bytes total
        body = f"<article><h1>{title}</h1><p>{_sentence(rng, 25)}</p></article>"
    elif stratum == 18:  # oversized page (truncation stratum; cap tests lower the cap)
        body = f"<article><h1>{title}</h1>{_article_paragraphs(rng, 60, 80)}</article>"
    else:  # medium article, >= 5000 bytes (x page_scale)
        body = f"<article><h1>{title}</h1>{_article_paragraphs(rng, 15 * page_scale, 50)}</article>"
    doc = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{nav}{body}{footer}{links}</body></html>"
    )
    return doc.encode("utf-8")


def _make_url(host: str, page_id: int) -> str:
    stratum = page_id % 100
    section = "private" if stratum == 19 else f"sec{page_id % 7}"
    url = f"https://{host}/{section}/page{page_id}"
    if page_id % 50 == 7:  # query-string + fragment stratum (canonicalization)
        url += "?b=2&a=1&utm_source=feed#frag"
    return url


class CorpusSpec:
    """Row-local deterministic corpus spec: every page (html, text, lang,
    outlinks) is a pure function of (seed, page_id), so generation
    distributes embarrassingly (gen_corpus_spark) and the sequential
    generator (gen_corpus) produces byte-identical rows — equality is
    pinned by tests/test_fixtures.py."""

    def __init__(self, n_pages: int, n_seeds: int, seed: int = SEED, page_scale: int = 1):
        self.n_pages, self.n_seeds, self.seed = n_pages, n_seeds, seed
        self.page_scale = page_scale
        self.n_hosts = max(16, n_pages // 50)
        self.hosts = [f"host{k}.example" for k in range(self.n_hosts)]
        weights = _host_weights(self.n_hosts)
        self.cumulative: list[float] = []
        acc = 0.0
        for w in weights:
            acc += w
            self.cumulative.append(acc)

    def host_for(self, page_id: int) -> str:
        r = random.Random(self.seed * 1_000_003 + page_id).random()
        for k, c in enumerate(self.cumulative):
            if r <= c:
                return self.hosts[k]
        return self.hosts[-1]

    def url_for(self, page_id: int) -> str:
        return _make_url(self.host_for(page_id), page_id)

    def outlinks_for(self, pid: int) -> list[str]:
        n_pages, n_seeds, seed = self.n_pages, self.n_seeds, self.seed
        prng = random.Random(seed * 7_000_037 + pid)
        n_out = prng.randint(0, 8)
        outlinks: list[str] = []
        my_host = self.url_for(pid).split("/")[2]
        for _ in range(n_out):
            roll = prng.random()
            if roll < 0.60:  # same-host target (biased by retry)
                tgt = self.url_for(prng.randrange(n_pages))
                for _ in range(4):
                    if tgt.split("/")[2] == my_host:
                        break
                    tgt = self.url_for(prng.randrange(n_pages))
            elif roll < 0.90:  # cross-host
                tgt = self.url_for(prng.randrange(n_pages))
            elif roll < 0.95:  # duplicate of an early (seed) url
                tgt = self.url_for(prng.randrange(min(n_seeds, n_pages)))
            elif roll < 0.98:  # uncanonical variant
                base = self.url_for(prng.randrange(n_pages))
                tgt = base.replace("https://", "HTTPS://", 1) + "#x"
            else:  # disallowed path
                host = self.url_for(prng.randrange(n_pages)).split("/")[2]
                tgt = f"https://{host}/private/page{prng.randrange(n_pages)}"
            outlinks.append(tgt)
        return outlinks

    def page_row(self, pid: int) -> tuple[dict, list[str]]:
        outlinks = self.outlinks_for(pid)
        html = _page_html(
            random.Random(self.seed * 11_000_011 + pid),
            pid,
            f"Title {pid}",
            outlinks,
            self.page_scale,
        )
        text = extract_text(html)
        lang = "en" if pid % 10 != 9 else LANG_CYCLE[(pid // 10) % 3]
        row = {
            "url": self.url_for(pid),
            "warc_ts": EPOCH + timedelta(seconds=pid * 137),
            "html": html,
            "text": text,
            "lang": lang,
        }
        return row, outlinks


def gen_corpus(n_pages: int = 2000, n_seeds: int = 200, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Generate all four tables; returns dict of pandas DataFrames."""
    spec = CorpusSpec(n_pages, n_seeds, seed)
    hosts, n_hosts = spec.hosts, spec.n_hosts
    page_urls: list[str] = [spec.url_for(pid) for pid in range(n_pages)]
    page_rows: list[dict] = []
    links_rows: list[dict] = []
    for pid in range(n_pages):
        row, outlinks = spec.page_row(pid)
        page_rows.append(row)
        for tgt in outlinks:
            links_rows.append({"src_url": page_urls[pid], "dst_url": tgt})

    pages = pd.DataFrame(page_rows)
    links = pd.DataFrame(links_rows, columns=["src_url", "dst_url"])

    # --- seeds -------------------------------------------------------------
    seeds = gen_seeds(spec)
    robots = gen_robots(spec)
    return {"pages": pages, "seeds": seeds, "robots": robots, "links": links}


def gen_seeds(spec: CorpusSpec) -> pd.DataFrame:
    n_pages, n_seeds, seed = spec.n_pages, spec.n_seeds, spec.seed
    stride = max(1, n_pages // n_seeds)
    base_seeds = [spec.url_for((i * stride) % n_pages) for i in range(n_seeds)]
    seed_urls: list[str] = list(base_seeds)
    srng = random.Random(seed * 13_000_013)
    for i in range(max(1, n_seeds // 20)):  # 5% duplicates
        seed_urls.append(base_seeds[srng.randrange(len(base_seeds))])
    for i in range(max(1, n_seeds // 50)):  # 2% uncanonical variants
        base = base_seeds[srng.randrange(len(base_seeds))]
        variant = srng.choice(
            [
                base.replace("https://", "HTTP://", 1).replace("http://", "http://", 1),
                base.replace(".example/", ".example:443/", 1),
                base + "#frag2",
                base.replace("/sec", "/x/../sec", 1),
            ]
        )
        seed_urls.append(variant)
    invalid = [
        "ftp://host0.example/sec0/page0",
        "https://localhost/private/x",
        "https://192.168.1.5/sec1/page1",
        "https://10.0.0.8/sec2/page2",
    ]
    for i in range(max(1, n_seeds // 50)):  # 2% invalid
        seed_urls.append(invalid[i % len(invalid)])
    for i in range(max(1, n_seeds // 100)):  # 1% absent from pages (fetch failures)
        seed_urls.append(f"https://host0.example/sec0/missing{i}")
    return pd.DataFrame(
        {
            "url": seed_urls,
            "seq": range(len(seed_urls)),
            "priority": [s % 3 for s in range(len(seed_urls))],
        }
    )


def gen_robots(spec: CorpusSpec) -> pd.DataFrame:
    hosts, n_hosts = spec.hosts, spec.n_hosts
    return pd.DataFrame(
        {
            "host": hosts,
            "crawl_delay_ms": [(0, 100, 500, 1000)[k % 4] for k in range(n_hosts)],
            "disallow_prefixes": [["/private"] if k % 5 == 0 else [] for k in range(n_hosts)],
            "max_per_round": [(5, 20, 1000)[k % 3] for k in range(n_hosts)],
            "fetched_ts": [EPOCH] * n_hosts,
        }
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
SEEDS_SCHEMA = "url string, seq long, priority int"
ROBOTS_SCHEMA = (
    "host string, crawl_delay_ms long, disallow_prefixes array<string>, "
    "max_per_round int, fetched_ts timestamp"
)
LINKS_SCHEMA = "src_url string, dst_url string"


def corpus_to_spark(spark, corpus: dict[str, pd.DataFrame]):
    """Materialize the pandas corpus as Spark DataFrames (Arrow path)."""
    return {
        "pages": spark.createDataFrame(corpus["pages"], schema=PAGES_SCHEMA),
        "seeds": spark.createDataFrame(corpus["seeds"], schema=SEEDS_SCHEMA),
        "robots": spark.createDataFrame(corpus["robots"], schema=ROBOTS_SCHEMA),
        "links": spark.createDataFrame(corpus["links"], schema=LINKS_SCHEMA),
    }


def write_corpus(spark, corpus: dict[str, pd.DataFrame], out_dir: str) -> None:
    dfs = corpus_to_spark(spark, corpus)
    for name, df in dfs.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def write_corpus_spark(
    spark, n_pages: int, n_seeds: int, out_dir: str, seed: int = SEED, page_scale: int = 1
) -> None:
    """Distributed corpus generation: pages/links rows are pure functions
    of page_id (CorpusSpec), so generation fans out over an id range via
    mapInPandas — byte-identical to gen_corpus (tests/test_fixtures.py)
    but ~n_cores faster, which is what makes 10^5-page bench corpora
    feasible. seeds/robots are small and stay driver-side."""
    from pyspark.sql import functions as F

    spec = CorpusSpec(n_pages, n_seeds, seed, page_scale)

    def gen_pages(batches):
        for pdf in batches:
            rows = []
            for pid in pdf["pid"]:
                row, _outlinks = spec.page_row(int(pid))
                rows.append(row)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    def gen_links(batches):
        # outlinks_for is independent of the (expensive) html build, so the
        # links table comes from a second, html-free pass — no doubled
        # intermediate table on disk for 10-GB corpora
        for pdf in batches:
            srcs, dsts = [], []
            for pid in pdf["pid"]:
                src = spec.url_for(int(pid))
                for dst in spec.outlinks_for(int(pid)):
                    srcs.append(src)
                    dsts.append(dst)
            yield pd.DataFrame({"src_url": srcs, "dst_url": dsts})

    # bound rows-per-generation-task so the per-task pandas frame stays
    # ~100 MB even for 10^5-page × page_scale corpora (2k pages × ~60 KB)
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        (n_pages + 1999) // 2000,
    )
    ids = spark.range(0, n_pages, 1, n_parts).select(F.col("id").alias("pid"))
    ids.mapInPandas(
        gen_pages,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")
    ids.mapInPandas(gen_links, "src_url string, dst_url string").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/links.parquet")
    spark.createDataFrame(gen_seeds(spec), schema=SEEDS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/seeds.parquet")
    spark.createDataFrame(gen_robots(spec), schema=ROBOTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/robots.parquet")
