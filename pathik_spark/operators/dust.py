"""DUST parameter mining — learning content-irrelevant URL parameters.

"Different URLs with Similar Text" (Bar-Yossef et al., WWW 2007 — the
DUST paper) is a fact of crawl life: session ids, tracking tags, and
sort/view parameters mint unbounded URL aliases for the same bytes.
The canonicalizer (kernels/canonical.py) strips a FIXED, public list
(``utm_*`` and friends); this operator learns the *host-specific*
rest from the crawl's own evidence, so round N+1 stops re-fetching
what round N proved redundant.

The evidence test, per (host, parameter): group the host's URLs by
"the URL with this parameter removed" (the residual key). A group
where ≥ 2 distinct URLs — i.e. the parameter's value varies or the
parameter is present/absent — served exactly ONE distinct content
hash is a demonstration that the parameter did not matter there. A
parameter is ruled dust when every tested group collapsed and at
least ``min_groups`` groups were tested (one group can be a
coincidence; the paper's rule-support idea).

Shapes (100 TB stance): query-string parse and residual-key assembly
are pure array expressions (``split`` + HOF ``filter`` +
``array_sort`` — no UDF) inside the scan; the two aggregations are
map-side-combinable groupBys on natural keys ((host, param,
residual) then (host, param)), each output row count bounded by the
crawl's distinct (host, param) surface — never all-pairs, never a
window over the corpus. Skewed hosts ride AQE like every other
host-keyed agg in the repo.

Reference parity: justrach/pathik keys its seen-set by the raw URL
string (crawler.go) — every dust variant is a fresh fetch; this
operator is the new-build scale answer (SURVEY §2.9 family, sibling
of aliases.canonical_collapse which handles the page-declared case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUERY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)"
BASE_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*)"


def url_param_evidence(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    content_col: str = "content_hash",
) -> DataFrame:
    """Per (host, param, residual_key) group evidence:
    ``(host, param, residual_key, n_urls, n_contents)``.

    ``residual_key`` is the URL with every occurrence of the parameter
    removed and the remaining query pairs sorted (order-insensitive —
    ``?a=1&b=2`` and ``?b=2&a=1`` are one residual). Only URLs that
    CONTAIN the parameter emit evidence rows for it, so a group tests
    value variation only (``?id=1`` vs ``?id=2``): present-vs-absent
    collapse (``?id=1`` vs no query) is deliberately out of scope —
    URLs lacking the parameter never join its groups.
    """
    url = F.col(url_col)
    qs = F.regexp_extract(url, QUERY_RE, 1)
    base = F.regexp_extract(url, BASE_RE, 1)
    pairs = F.split(qs, "&")
    rows = (
        pages.select(
            F.col(host_col).alias("host"),
            url.alias("url"),
            F.col(content_col).alias("content_hash"),
            base.alias("base"),
            pairs.alias("pairs"),
        )
        .filter(qs != "")
        .select(
            "host", "url", "content_hash", "base", "pairs",
            F.explode(F.array_distinct("pairs")).alias("kv"),
        )
        .select(
            "host", "url", "content_hash", "base",
            F.split(F.col("kv"), "=").getItem(0).alias("param"),
            F.array_sort(
                F.filter(
                    F.col("pairs"),
                    lambda x: F.split(x, "=").getItem(0)
                    != F.split(F.col("kv"), "=").getItem(0),
                )
            ).alias("residual_pairs"),
        )
        .filter(F.col("param") != "")
        .select(
            "host", "url", "content_hash", "param",
            F.concat(
                F.col("base"), F.lit("?"),
                F.array_join(F.col("residual_pairs"), "&"),
            ).alias("residual_key"),
        )
    )
    return rows.groupBy("host", "param", "residual_key").agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("content_hash").alias("n_contents"),
    )


def dust_params(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    content_col: str = "content_hash",
    min_groups: int = 2,
) -> DataFrame:
    """(host, param, groups_tested, groups_collapsed, is_dust) —
    the learned per-host dust-parameter table.

    A group tests the parameter only when it holds ≥ 2 distinct URLs;
    it *collapsed* when those URLs served one distinct content hash.
    ``is_dust`` = every tested group collapsed AND ≥ ``min_groups``
    groups tested — the strip-list feed for the next round's
    canonicalization (a single counterexample group vetoes).
    """
    ev = url_param_evidence(
        pages, url_col=url_col, host_col=host_col, content_col=content_col
    )
    tested = F.col("n_urls") >= 2
    collapsed = tested & (F.col("n_contents") == 1)
    agg = ev.groupBy("host", "param").agg(
        F.sum(tested.cast("int")).alias("groups_tested"),
        F.sum(collapsed.cast("int")).alias("groups_collapsed"),
    )
    is_dust = (
        (F.col("groups_tested") >= min_groups)
        & (F.col("groups_collapsed") == F.col("groups_tested"))
    )
    return agg.select(
        "host", "param", "groups_tested", "groups_collapsed",
        is_dust.cast("int").alias("is_dust"),
    )


def strip_dust_params(
    frontier: DataFrame,
    dust: DataFrame,
    url_col: str = "url",
    host_col: str | None = "host",
) -> DataFrame:
    """Rewrite frontier URLs by dropping their host's learned dust
    parameters (broadcast of the tiny (host, param) strip list; the
    frontier never shuffles). Residual query pairs keep their original
    order — this is a *strip*, not a canonicalization; feed the result
    to the canonicalizer for ordering rules. With ``host_col=None``
    the host is derived from the URL in the scan (pre-frontier-prep
    hook: the crawl driver strips seeds before canonicalization)."""
    strip = (
        dust.filter(F.col("is_dust") == 1)
        .groupBy(F.col("host").alias("_h"))
        .agg(F.collect_set("param").alias("_dust"))
    )
    derived_host = None
    if host_col is None:
        from pathik_spark.functions import urls as U

        host_col = "_dust_host"
        derived_host = host_col
        frontier = frontier.withColumn(
            host_col, U.hostname_of(F.col(url_col))
        )
    url = F.col(url_col)
    qs = F.regexp_extract(url, QUERY_RE, 1)
    base = F.regexp_extract(url, BASE_RE, 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda x: ~F.array_contains(
            F.col("_dust"), F.split(x, "=").getItem(0)
        ),
    )
    stripped = F.when(
        (qs == "") | F.col("_dust").isNull(), url
    ).otherwise(
        F.when(F.size(kept) == 0, base).otherwise(
            F.concat(base, F.lit("?"), F.array_join(kept, "&"))
        )
    )
    out = frontier.join(
        F.broadcast(strip), frontier[host_col] == strip["_h"], "left"
    )
    out = out.withColumn(url_col, stripped).drop("_h", "_dust")
    if derived_host is not None:
        out = out.drop(derived_host)
    return out
