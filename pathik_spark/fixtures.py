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


def _page_html(rng: random.Random, page_id: int, title: str, outlinks: list[str]) -> bytes:
    """Templated HTML covering the reference's heuristic boundaries."""
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
    else:  # medium article, >= 5000 bytes
        body = f"<article><h1>{title}</h1>{_article_paragraphs(rng, 15, 50)}</article>"
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


def gen_corpus(n_pages: int = 2000, n_seeds: int = 200, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Generate all four tables; returns dict of pandas DataFrames."""
    rng = random.Random(seed)
    n_hosts = max(16, n_pages // 50)
    hosts = [f"host{k}.example" for k in range(n_hosts)]
    weights = _host_weights(n_hosts)
    cumulative: list[float] = []
    acc = 0.0
    for w in weights:
        acc += w
        cumulative.append(acc)

    def host_for(page_id: int) -> str:
        r = random.Random(seed * 1_000_003 + page_id).random()
        for k, c in enumerate(cumulative):
            if r <= c:
                return hosts[k]
        return hosts[-1]

    # --- pages -------------------------------------------------------------
    page_urls: list[str] = []
    page_rows: list[dict] = []
    for pid in range(n_pages):
        host = host_for(pid)
        url = _make_url(host, pid)
        page_urls.append(url)
    # outlinks reference other page urls — build after urls exist
    links_rows: list[dict] = []
    for pid in range(n_pages):
        prng = random.Random(seed * 7_000_037 + pid)
        n_out = prng.randint(0, 8)
        outlinks: list[str] = []
        for j in range(n_out):
            roll = prng.random()
            if roll < 0.60:  # same-host target
                tgt = page_urls[prng.randrange(n_pages)]
                # bias same-host by retrying a few times
                for _ in range(4):
                    if tgt.split("/")[2] == page_urls[pid].split("/")[2]:
                        break
                    tgt = page_urls[prng.randrange(n_pages)]
            elif roll < 0.90:  # cross-host
                tgt = page_urls[prng.randrange(n_pages)]
            elif roll < 0.95:  # duplicate of an early (seed) url
                tgt = page_urls[prng.randrange(min(n_seeds, n_pages))]
            elif roll < 0.98:  # uncanonical variant
                base = page_urls[prng.randrange(n_pages)]
                tgt = base.replace("https://", "HTTPS://", 1) + "#x"
            else:  # disallowed path
                host = page_urls[prng.randrange(n_pages)].split("/")[2]
                tgt = f"https://{host}/private/page{prng.randrange(n_pages)}"
            outlinks.append(tgt)
        html = _page_html(random.Random(seed * 11_000_011 + pid), pid, f"Title {pid}", outlinks)
        text = extract_text(html)
        lang = "en" if pid % 10 != 9 else LANG_CYCLE[(pid // 10) % 3]
        page_rows.append(
            {
                "url": page_urls[pid],
                "warc_ts": EPOCH + timedelta(seconds=pid * 137),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
        for tgt in outlinks:
            links_rows.append({"src_url": page_urls[pid], "dst_url": tgt})

    pages = pd.DataFrame(page_rows)
    links = pd.DataFrame(links_rows, columns=["src_url", "dst_url"])

    # --- seeds -------------------------------------------------------------
    stride = max(1, n_pages // n_seeds)
    base_seeds = [page_urls[(i * stride) % n_pages] for i in range(n_seeds)]
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
    seeds = pd.DataFrame(
        {
            "url": seed_urls,
            "seq": range(len(seed_urls)),
            "priority": [s % 3 for s in range(len(seed_urls))],
        }
    )

    # --- robots ------------------------------------------------------------
    robots = pd.DataFrame(
        {
            "host": hosts,
            "crawl_delay_ms": [(0, 100, 500, 1000)[k % 4] for k in range(n_hosts)],
            "disallow_prefixes": [["/private"] if k % 5 == 0 else [] for k in range(n_hosts)],
            "max_per_round": [(5, 20, 1000)[k % 3] for k in range(n_hosts)],
            "fetched_ts": [EPOCH] * n_hosts,
        }
    )
    return {"pages": pages, "seeds": seeds, "robots": robots, "links": links}


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
