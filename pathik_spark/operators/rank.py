"""Host-graph link analysis for crawl prioritization.

A frontier at 10^10 URLs cannot treat every host equally: the politeness
scheduler (operators/scheduler.py) caps per-host throughput, so the
*order* in which hosts get their budget is the real lever. PageRank over
the host-level link graph (hosts as nodes, inter-host link counts as
edge weights) is the classic prioritization signal — this module
computes it with a FIXED number of power iterations so the result is a
deterministic function of the edge table (checkable cross-engine, no
convergence-dependent stopping).

Scale shape: the host graph is tiny relative to the page graph (one row
per (src_host, dst_host) pair, pre-aggregated), every iteration is two
joins + one groupBy keyed by host, and the rank table is one row per
host — broadcastable against the frontier when the scheduler consumes
it. ``localCheckpoint`` per iteration keeps the loop's plan flat.

Dangling hosts (no out-links) leak their rank mass — the deterministic
simple variant; both the engine and the DuckDB oracle state the same
formula, so the check is exact (final round to 6 decimals absorbs
float-summation-order noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_rank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iters: int = 3,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank with ``n_iters`` fixed power iterations.

    r_0(v)     = 1/n
    r_{k+1}(v) = (1-d)/n + d * sum over in-edges (u,v) of
                 r_k(u) * w(u,v) / out_w(u)

    Returns (host, rank) with rank rounded to 6 decimals.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["host"])
            .join(out_w, "src")
            .select(
                F.col("dst").alias("host"),
                (F.col("rank") * F.col("w") / F.col("out_w")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("host", F.round("rank", 6).alias("rank"))


def rank_priorities(
    frontier: DataFrame,
    ranks: DataFrame,
    n_tiers: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """Turn host PageRank into the politeness scheduler's integer
    ``priority`` (lower = scheduled sooner): hosts are tiered by rank
    descending with ``ntile``, and each frontier row takes its host's
    tier. Unranked hosts (not yet seen in the link graph) fall into the
    last tier.

    The rank table is one row per host — the global ntile sort and the
    broadcast against the frontier both touch only the small side, so
    this adds no frontier-sized shuffle to the schedule stage.

    Duplicate hosts in ``ranks`` (e.g. a union of PageRank and HITS
    outputs) are collapsed to their MAX rank first — a plain join would
    fan the frontier out and schedule the same URL twice. Unranked
    hosts take tier ``n_tiers`` — strictly AFTER every ranked host,
    including the worst-ranked quartile (a host we have rank evidence
    for beats one we have never seen in the link graph).
    """
    deduped = ranks.groupBy("host").agg(F.max("rank").alias("rank"))
    w = Window.orderBy(F.desc("rank"), F.asc("host"))
    tiers = deduped.select(
        F.col("host"), (F.ntile(n_tiers).over(w) - 1).alias("_tier")
    )
    return (
        frontier.join(
            F.broadcast(tiers), frontier[host_col] == tiers["host"], "left"
        )
        .drop(tiers["host"])
        .withColumn("priority", F.coalesce(F.col("_tier"), F.lit(n_tiers)))
        .drop("_tier")
    )


def hits_scores(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
) -> DataFrame:
    """HITS hubs & authorities over the weighted host graph — the
    complement to ``host_rank``: PageRank finds globally endorsed hosts,
    HITS separates *directories* (hubs — link out to many good pages:
    seed-list candidates) from *content* (authorities — linked from many
    good hubs: crawl-priority candidates). Kleinberg (1999), public.

    Fixed ``n_iters`` mutual-reinforcement iterations:

        a_{k+1}(v) = sum over in-edges  (u,v) of h_k(u)     * w(u,v)
        h_{k+1}(u) = sum over out-edges (u,v) of a_{k+1}(v) * w(u,v)

    Exactness device (cross-engine, partitioning-independent): scores
    live in integer MICRO units. Each half-step normalizes by the MAX
    (max of integers is exact and order-free, unlike the L1/L2 float
    sums of textbook HITS — same limit direction, different scale) and
    re-rounds to micro ints, so every per-node sum is an INTEGER sum of
    integer products — associative, hence identical in Spark and the
    DuckDB oracle (`hits_scores`) at any parallelism.

    Same scale shape as host_rank: per-iteration cost is two
    (join + map-side-combined groupBy) passes over the host-graph edge
    table, which is tiny relative to the page graph; ``localCheckpoint``
    keeps the loop's plan flat. Returns (host, authority, hub), both in
    [0, 1] (max-normalized), rounded to 6 decimals.
    """
    micro = 1_000_000
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.select("host", F.lit(micro).cast("long").alias("m"))
    a = h

    def _half(scores: DataFrame, edge_key: str, out_key: str) -> DataFrame:
        """One normalized half-step: pull scores across edges onto
        ``out_key``'s side, max-normalize, round back to micro ints."""
        s = (
            e.join(scores, e[edge_key] == scores["host"])
            .select(F.col(out_key).alias("host"), (F.col("m") * F.col("w")).alias("p"))
            .groupBy("host")
            .agg(F.sum("p").alias("s"))
        )
        full = nodes.join(s, "host", "left").select(
            "host", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        )
        mx = full.agg(F.greatest(F.max("s"), F.lit(1)).cast("long").alias("mx"))
        return (
            full.crossJoin(F.broadcast(mx))
            .select(
                "host",
                F.round(F.col("s") / F.col("mx") * F.lit(float(micro)))
                .cast("long")
                .alias("m"),
            )
            .localCheckpoint()
        )

    for _ in range(n_iters):
        a = _half(h, "src", "dst")   # authorities gather hub mass in-links
        h = _half(a, "dst", "src")   # hubs gather authority mass out-links
    return (
        nodes.join(a.withColumnRenamed("m", "am"), "host")
        .join(h.withColumnRenamed("m", "hm"), "host")
        .select(
            "host",
            F.round(F.col("am") / F.lit(float(micro)), 6).alias("authority"),
            F.round(F.col("hm") / F.lit(float(micro)), 6).alias("hub"),
        )
    )


def host_graph_stats(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
) -> DataFrame:
    """Per-host link-graph degree profile: (host, out_deg, in_deg,
    out_w, in_w, reciprocity) — the crawl-analytics companion to
    host_rank/hits_scores. ``reciprocity`` is the fraction of a host's
    distinct out-neighbors that link back (mutual-link rate: near-1 for
    link farms and mirror rings, near-0 for organic content — a cheap
    spam-neighborhood signal the scheduler can consume like a rank).

    Shape: two map-side-combined groupBys on the edge table's own keys
    plus one self-equi-join of the DISTINCT pair set against its own
    reverse — all keyed joins on the (tiny relative to pages) host
    graph; no corpus contact. Degrees count distinct neighbors; weights
    sum the edge weight column.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    pairs = e.select("src", "dst").distinct()
    back = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = (
        pairs.join(back, ["src", "dst"])
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("n_mutual"))
    )
    outs = e.groupBy("src").agg(
        F.count_distinct("dst").cast("long").alias("out_deg"),
        F.sum("w").alias("out_w"),
    )
    ins = (
        e.groupBy("dst")
        .agg(
            F.count_distinct("src").cast("long").alias("in_deg"),
            F.sum("w").alias("in_w"),
        )
        .withColumnRenamed("dst", "src")
    )
    nodes = pairs.select("src").union(back.select("src")).distinct()
    return (
        nodes.join(outs, "src", "left")
        .join(ins, "src", "left")
        .join(mutual, "src", "left")
        .select(
            F.col("src").alias("host"),
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
            F.when(
                F.coalesce("out_deg", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_mutual", F.lit(0)) / F.col("out_deg"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("reciprocity"),
        )
    )


def host_components(
    edges: DataFrame,
    min_weight: int = 1,
    mutual_only: bool = True,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
) -> DataFrame:
    """Mirror-site / link-farm host families: connected components over
    the MUTUAL-link host pairs. Components over the raw directed host
    graph would collapse most of the web into one blob (it is largely
    connected); restricting to reciprocal edges of weight >=
    ``min_weight`` keeps each component a densely interlinked family —
    mirrors, syndication rings, farms — the unit a crawl dedups,
    throttles or blocklists wholesale (the component feeds
    blocklist.host_blocklist_filter / backoff overrides directly).

    Reuses dedup.connected_components (alternating large-star /
    small-star, O(log^2 n) rounds, host-count-sized edge shuffles —
    never corpus-sized). Hosts without a qualifying mutual link are
    singletons by definition and are omitted. Returns
    (host, component_id, component_size); component_id is the
    lexicographic-min host of the family (deterministic).
    """
    from pathik_spark.operators.dedup import connected_components

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col(weight_col) >= F.lit(int(min_weight)))
    if mutual_only:
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).distinct()
        e = e.join(rev, ["src", "dst"], "left_semi")
    labels = connected_components(e, id_a="src", id_b="dst")
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("component_size")
    )
    return labels.join(sizes, "cluster_id").select(
        F.col("doc_id").alias("host"),
        F.col("cluster_id").alias("component_id"),
        F.col("component_size"),
    )
