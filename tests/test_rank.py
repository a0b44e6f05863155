"""Host-graph PageRank (operators/rank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.rank import host_rank


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src_host", "dst_host", "weight"])


def test_uniform_ring_stays_uniform(spark):
    # symmetric ring: every node has equal in/out weight -> rank stays 1/n
    n = 6
    rows = [(f"h{i}", f"h{(i + 1) % n}", 1) for i in range(n)]
    out = {r["host"]: r["rank"] for r in host_rank(_edges(spark, rows)).collect()}
    assert len(out) == n
    for v in out.values():
        assert abs(v - 1.0 / n) < 1e-6


def test_hub_attracts_rank(spark):
    # every spoke links to the hub; hub links back to one spoke
    rows = [(f"s{i}", "hub", 1) for i in range(5)] + [("hub", "s0", 1)]
    out = {r["host"]: r["rank"] for r in host_rank(_edges(spark, rows)).collect()}
    assert out["hub"] == max(out.values())
    assert out["s0"] > out["s1"]  # hub's back-link benefits s0 only


def test_rank_mass_conserved_without_dangling(spark):
    # strongly-connected-ish: everyone has out-edges -> total mass == 1
    rows = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("b", "a", 1)]
    total = (
        host_rank(_edges(spark, rows))
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
    )
    assert abs(total - 1.0) < 1e-5


def test_weights_matter(spark):
    # a splits its mass 9:1 between b and c -> b ends up above c
    rows = [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    out = {r["host"]: r["rank"] for r in host_rank(_edges(spark, rows)).collect()}
    assert out["b"] > out["c"]


def test_rank_priorities_order_hosts_by_tier(spark):
    ranks = spark.createDataFrame(
        [("big", 0.5), ("mid", 0.3), ("low", 0.15), ("tiny", 0.05)],
        ["host", "rank"],
    )
    frontier = spark.createDataFrame(
        [(i, h) for i, h in enumerate(["low", "big", "tiny", "mid", "unseen"])],
        ["url_hash", "host"],
    )
    from pathik_spark.operators.rank import rank_priorities

    out = {r["host"]: r["priority"] for r in rank_priorities(frontier, ranks).collect()}
    assert out["big"] == 0 and out["mid"] == 1 and out["low"] == 2
    assert out["tiny"] == 3
    assert out["unseen"] == 4  # unranked -> strictly after EVERY ranked host
    # the scheduler consumes priority ascending: big before mid before low
    assert out["big"] < out["mid"] < out["low"] < out["tiny"] < out["unseen"]


def test_rank_priorities_dedupes_rank_table(spark):
    from pathik_spark.operators.rank import rank_priorities

    ranks = spark.createDataFrame(
        [("a", 0.5), ("a", 0.9), ("b", 0.2)], ["host", "rank"]
    )
    frontier = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["url_hash", "host"]
    )
    out = rank_priorities(frontier, ranks).collect()
    assert len(out) == 3  # duplicate 'a' rank rows must NOT fan the frontier out
    pri = {r["url_hash"]: r["priority"] for r in out}
    assert pri[1] == pri[2] < pri[3]  # max-rank wins for 'a'


def test_hits_hub_vs_authority_separation(spark):
    # star: 'dir' links out to a/b/c (pure hub); a/b/c have no out-links
    # (pure authorities); 'stray' links only to 'dir'
    edges = spark.createDataFrame(
        [("dir", "a", 2), ("dir", "b", 2), ("dir", "c", 2), ("stray", "dir", 1)],
        ["src_host", "dst_host", "weight"],
    )
    from pathik_spark.operators.rank import hits_scores

    out = {r["host"]: r for r in hits_scores(edges, n_iters=3).collect()}
    assert out["dir"]["hub"] == 1.0           # the best hub, max-normalized
    assert out["a"]["authority"] == 1.0       # symmetric best authorities
    assert out["a"]["authority"] == out["b"]["authority"] == out["c"]["authority"]
    assert out["a"]["hub"] == 0.0             # no out-links
    assert out["dir"]["authority"] < 1.0      # only stray endorses it
    assert out["stray"]["hub"] < 1.0          # its one target is a weak authority


def test_hits_partitioning_independent(spark):
    rows = [
        (f"h{i % 7}", f"h{(i * 3 + 1) % 7}", (i % 4) + 1)
        for i in range(40)
        if i % 7 != (i * 3 + 1) % 7
    ]
    edges = spark.createDataFrame(rows, ["src_host", "dst_host", "weight"])
    from pathik_spark.operators.rank import hits_scores

    one = sorted(map(tuple, hits_scores(edges.coalesce(1), n_iters=3).collect()))
    many = sorted(map(tuple, hits_scores(edges.repartition(13), n_iters=3).collect()))
    assert one == many  # integer-micro sums make this exact, not approx


def test_host_graph_stats_degrees_and_reciprocity(spark):
    # a<->b mutual; a->c one-way; c->a closes a different pair (c's only
    # out-neighbor links back); d is a pure sink
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 1), ("a", "c", 2), ("c", "a", 5), ("a", "d", 1)],
        ["src_host", "dst_host", "weight"],
    )
    from pathik_spark.operators.rank import host_graph_stats

    out = {r["host"]: r for r in host_graph_stats(edges).collect()}
    a = out["a"]
    assert (a["out_deg"], a["in_deg"], a["out_w"], a["in_w"]) == (3, 2, 6, 6)
    # a's out-neighbors {b, c, d}: b and c link back -> 2/3
    assert a["reciprocity"] == round(2 / 3, 6)
    assert out["b"]["reciprocity"] == 1.0   # its one out-neighbor (a) links back
    assert out["c"]["reciprocity"] == 1.0
    assert out["d"]["out_deg"] == 0 and out["d"]["reciprocity"] == 0.0
    assert out["d"]["in_deg"] == 1 and out["d"]["in_w"] == 1


def test_host_components_mutual_chain(spark):
    from pathik_spark.operators.rank import host_components

    edges = spark.createDataFrame(
        [
            ("a", "b", 5), ("b", "a", 5),      # mutual pair
            ("b", "c", 2), ("c", "b", 9),      # chains the component
            ("d", "e", 9),                      # one-way: excluded
            ("f", "g", 1), ("g", "f", 1),      # below min_weight
        ],
        ["src_host", "dst_host", "weight"],
    )
    out = {
        r["host"]: (r["component_id"], r["component_size"])
        for r in host_components(edges, min_weight=2).collect()
    }
    assert out == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3)}


def test_host_components_weight_gate_is_per_direction(spark):
    from pathik_spark.operators.rank import host_components

    # mutual but one direction below the gate -> not a qualifying pair
    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 1)], ["src_host", "dst_host", "weight"]
    )
    assert host_components(edges, min_weight=2).count() == 0
