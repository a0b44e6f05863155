"""Focused-crawl frontier prioritization from anchor-text relevance.

A focused crawler (Chakrabarti/van den Berg/Dom 1999; shark-search)
orders its frontier by how topical each UNCRAWLED URL looks, using the
only evidence it has before fetching: the anchor text of the links
pointing at the URL, and the URL's own path tokens. This is the
scheduling half the generic politeness scheduler (operators/
scheduler.py) does not cover — WHAT to fetch first, not WHEN a host
allows it. The reference crawls breadth-first from seeds
(crawler.go's queue); topical frontier scoring is the re-expression a
100 TB corpus build needs when the budget is smaller than the web.

``focused_frontier_scores`` is fully relational and exact:

- tokenize each inbound anchor text and the URL path with the same
  lowercase non-alphanumeric split (scan-local ``split`` +
  ``explode``; codegen, no UDF);
- broadcast-join the tokens against a small (term -> integer micro
  weight) topic profile — the profile is curator-supplied or distilled
  from a seed corpus, always tiny next to the frontier;
- per URL: the summed weight of matched anchor tokens (every
  occurrence counts — five inlinks saying "spark tutorial" ARE
  stronger evidence than one), the summed weight of matched URL-path
  tokens, and the count of matching inlinks.

Integer micro-weights keep the score exact under any partitioning
(same discipline as operators/lm.py). Identical (dst, anchor) pairs
are pre-aggregated with a count BEFORE tokenizing — boilerplate
anchors ("read more" x 10^6) tokenize once, not once per inlink. The
only data-sized shuffles are keyed by dst_url — the distribution the
frontier already has — and every groupBy is map-side combinable.
Consumers feed ``score_micro`` into the politeness scheduler's
priority column; nothing here sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _tokens(text) -> "F.Column":
    """Non-empty lowercase alphanumeric tokens of a string column."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def focused_frontier_scores(
    anchors: DataFrame,
    topic: DataFrame,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Score frontier URLs by topical evidence.

    ``anchors``: one row per inbound link — (dst_url, anchor text).
    ``topic``: (term string, weight_micro bigint) — small, broadcast.

    Returns one row per distinct dst_url:
      - ``anchor_score_micro``: summed weight of matched anchor-token
        occurrences across ALL inlinks;
      - ``url_score_micro``: summed weight of matched URL path+query
        tokens (scheme/host excluded — host reputation is
        operators/rank.py's job);
      - ``n_hit_inlinks``: inlinks whose anchor matched >= 1 term;
      - ``score_micro``: anchor + url score, the frontier priority.
    """
    pairs = anchors.select(
        F.col(dst_col).alias("dst_url"), F.col(anchor_col).alias("anchor")
    )
    # Dedup identical (dst, anchor) pairs first: boilerplate anchors
    # tokenize once and re-enter weighted by their multiplicity.
    grouped = pairs.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    anchor_toks = grouped.select(
        "dst_url",
        "n_links",
        F.explode(_tokens(F.col("anchor"))).alias("term"),
    )
    anchor_scores = (
        anchor_toks.join(F.broadcast(topic), "term")
        .groupBy("dst_url")
        .agg(
            F.sum(F.col("weight_micro") * F.col("n_links")).alias(
                "anchor_score_micro"
            )
        )
    )
    # inlinks with >= 1 matched term: arrays_overlap against the term
    # set, broadcast as a 1-row aggregate (the repo's standing
    # crossJoin discipline).
    topic_terms = F.broadcast(
        topic.groupBy().agg(F.collect_set("term").alias("_terms"))
    )
    hits = (
        grouped.crossJoin(topic_terms)
        .groupBy("dst_url")
        .agg(
            F.sum(
                F.when(
                    F.arrays_overlap(_tokens(F.col("anchor")), F.col("_terms")),
                    F.col("n_links"),
                ).otherwise(F.lit(0))
            ).alias("n_hit_inlinks")
        )
    )
    urls = pairs.select("dst_url").distinct()
    path_q = F.regexp_extract(
        F.col("dst_url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1
    )
    url_scores = (
        urls.select("dst_url", F.explode(_tokens(path_q)).alias("term"))
        .join(F.broadcast(topic), "term")
        .groupBy("dst_url")
        .agg(F.sum("weight_micro").alias("url_score_micro"))
    )
    return (
        urls.join(anchor_scores, "dst_url", "left")
        .join(url_scores, "dst_url", "left")
        .join(hits, "dst_url", "left")
        .select(
            F.col("dst_url").alias("url"),
            F.coalesce("anchor_score_micro", F.lit(0))
            .cast("bigint")
            .alias("anchor_score_micro"),
            F.coalesce("url_score_micro", F.lit(0))
            .cast("bigint")
            .alias("url_score_micro"),
            F.coalesce("n_hit_inlinks", F.lit(0))
            .cast("bigint")
            .alias("n_hit_inlinks"),
        )
        .withColumn(
            "score_micro",
            (F.col("anchor_score_micro") + F.col("url_score_micro")).cast(
                "bigint"
            ),
        )
    )


def frontier_from_scores(
    scores: DataFrame, n_tiers: int = 8, max_score_micro: int | None = None
) -> DataFrame:
    """Turn focused scores into CrawlRun-ready seeds (url, seq,
    priority): top-scoring URLs get priority 0, zero-score URLs the
    last tier. Tiers are fixed score bands (linear over
    [0, max_score_micro], which defaults to the topic profile's
    plausible per-URL ceiling estimated as a broadcast 1-row MAX) —
    banding keeps the mapping scan-local instead of a global
    percentile sort. ``seq`` is the portable 60-bit url hash, the
    scheduler's partitioning-independent FIFO tie-break (same idiom as
    discover.discover_seeds).
    """
    from pathik_spark.operators.dedup import portable_hash64

    if max_score_micro is None:
        top = F.broadcast(
            scores.groupBy().agg(F.max("score_micro").alias("_top"))
        )
        scored = scores.crossJoin(top)
    else:
        scored = scores.withColumn("_top", F.lit(int(max_score_micro)))
    band = F.when(
        (F.col("score_micro") <= 0) | (F.col("_top") <= 0),
        F.lit(n_tiers - 1),
    ).otherwise(
        F.least(
            F.lit(n_tiers - 2),
            ((F.lit(n_tiers - 1))
             * (F.col("_top") - F.col("score_micro"))
             / F.col("_top")).cast("int"),
        )
    )
    return scored.select(
        "url",
        portable_hash64(F.col("url")).alias("seq"),
        band.cast("int").alias("priority"),
    )
