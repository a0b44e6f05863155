"""Harmonic centrality: exact BFS arm + HyperBall HLL arm
(operators/centrality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.centrality import (
    MICRO,
    harmonic_centrality,
    hyperball_harmonic,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src_host string, dst_host string"
    )


def test_chain_distances(spark):
    # a -> b -> c: c is reached from a at d=2, b at d=1
    got = {
        r.host: (r.harmonic_micro, r.n_sources)
        for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("b", "c")])
        ).collect()
    }
    assert got["b"] == (MICRO, 1)
    assert got["c"] == (MICRO + MICRO // 2, 2)
    assert "a" not in got  # nobody links toward a


def test_direction_is_incoming(spark):
    # star out of hub: hub gains nothing; leaves get 1/1 each
    got = {
        r.host: r.harmonic_micro
        for r in harmonic_centrality(
            _edges(spark, [("hub", "x"), ("hub", "y"), ("hub", "z")])
        ).collect()
    }
    assert got == {"x": MICRO, "y": MICRO, "z": MICRO}


def test_cycle_shortest_not_walk(spark):
    # 3-cycle: d is the SHORTEST path, walks around the cycle ignored
    got = {
        r.host: (r.harmonic_micro, r.n_sources)
        for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        ).collect()
    }
    # each node: one source at d=1, one at d=2
    assert all(v == (MICRO + MICRO // 2, 2) for v in got.values())


def test_disconnected_contributes_zero(spark):
    got = {
        r.host: r.n_sources
        for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("x", "y")])
        ).collect()
    }
    assert got == {"b": 1, "y": 1}


def test_partitioning_independent(spark):
    pairs = [(f"h{i}", f"h{(i * 7 + 3) % 23}") for i in range(40)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, harmonic_centrality(e.repartition(1)).collect()))
    b = sorted(map(tuple, harmonic_centrality(e.repartition(13)).collect()))
    assert a == b


def test_hyperball_tracks_exact(spark):
    # sparse pseudo-random digraph, 60 nodes / 150 edges
    pairs = {
        (f"n{(i * 13 + j) % 60}", f"n{(i * 29 + j * 7 + 1) % 60}")
        for i in range(25)
        for j in range(6)
    }
    pairs = {(a, b) for a, b in pairs if a != b}
    e = _edges(spark, sorted(pairs))
    exact = {
        r.host: (r.harmonic_micro / MICRO, r.n_sources)
        for r in harmonic_centrality(e).collect()
    }
    est = {
        r.host: (r.harmonic_est, r.ball_est)
        for r in hyperball_harmonic(e, log2m=10).collect()
    }
    # aggregate mass within 15% (HLL @ m=1024 -> ~3.3% per count)
    tot_exact = sum(h for h, _ in exact.values())
    tot_est = sum(est[h][0] for h in exact)
    assert abs(tot_est - tot_exact) / tot_exact < 0.15
    # per-node ball sizes within 25% (+2 absolute slack for tiny balls)
    for h, (_, n_src) in exact.items():
        ball_exact = n_src + 1  # ball includes the node itself
        assert abs(est[h][1] - ball_exact) <= max(2.0, 0.25 * ball_exact)


def test_hyperball_deterministic(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    a = sorted(map(tuple, hyperball_harmonic(e, log2m=6).collect()))
    b = sorted(map(tuple, hyperball_harmonic(e.repartition(5), log2m=6).collect()))
    assert a == b
