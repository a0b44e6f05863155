"""Harmonic centrality over the host graph — exact and HyperBall arms.

PageRank (operators/rank.py) scores hosts by random-walk mass; harmonic
centrality — sum over sources u of 1/d(u, v) — scores them by how
*close* the rest of the web is, which Boldi & Vigna ("Axioms for
centrality", 2014) argue is the best-behaved centrality for web-graph
seed selection and crawl prioritization: it handles disconnected
graphs out of the box (unreachable pairs contribute 0) and is not
fooled by tight link farms the way degree is.

Two arms, the repo's standard exact/approximate split:

- ``harmonic_centrality`` — EXACT: iterative BFS frontier expansion
  (one join per hop, first-arrival distances via anti-join, lineage
  cut by localCheckpoint like the CC loop). The pair table is
  O(V·reachable) — the right arm for diagnostics and for the DuckDB
  oracle, and fine for graphs up to ~10^4 hosts, but quadratic in the
  worst case: NOT the 100 TB path.
- ``hyperball_harmonic`` — the scale arm: HyperBall (Boldi & Vigna,
  2013). Each host carries m = 2^log2m HLL registers; one BFS round
  is "pull in-neighbors' registers, take the element-wise max" —
  expressed as ``zip_with(…, greatest)`` folded over ``collect_list``
  in a two-phase salted aggregation (bounded partial groups, same
  skew device as the scheduler's salted top-k), so a power-law
  in-degree host never collects an unbounded list. Per-round state is
  one m-byte-ish array per host; total work is O(E · rounds), rounds
  ≈ graph diameter (the web's is ~16-25). |B_k(v)| estimates use the
  standard HLL estimator with the linear-counting small-range
  correction, and harmonic accumulates Σ_k (N_k − N_{k−1})/k.

Distances are measured along edge direction (d(u, v) over u → v
links): a host is central when many hosts *link toward* it in few
hops — the authority sense, matching host_rank.

Integer micro units (floor(1e6/d)) make the exact arm's sums
associative-exact and partitioning/engine-independent — the same
convention as lm.py/bm25.

Reference parity: justrach/pathik has no graph analytics (SURVEY §2.9
new-build family; sibling of host_rank / hits_scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    max_iters: int = 20,
) -> DataFrame:
    """(host, harmonic_micro, n_sources) — exact, incoming-distance
    harmonic centrality. ``n_sources`` counts hosts with a finite
    path to ``host``; hosts nobody links toward are absent (their
    centrality is 0 by the unreachable-pairs-contribute-0 rule)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    dist = nodes.select(
        F.col("u").alias("s"), F.col("u").alias("v"), F.lit(0).alias("d")
    ).localCheckpoint(eager=True)
    frontier = dist
    for k in range(1, max_iters + 1):
        hop = (
            frontier.select(
                F.col("s").alias("hs"), F.col("v").alias("hv")
            )
            .join(e, F.col("hv") == F.col("u"))
            .select(F.col("hs").alias("s"), F.col("v"), F.lit(k).alias("d"))
            .distinct()
        )
        new = hop.join(dist, ["s", "v"], "left_anti").localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        dist = dist.union(new).localCheckpoint(eager=True)
        frontier = new
    return (
        dist.filter(F.col("d") > 0)
        .groupBy("v")
        .agg(
            F.sum(F.floor(F.lit(MICRO) / F.col("d")).cast("bigint")).alias(
                "harmonic_micro"
            ),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .select(F.col("v").alias("host"), "harmonic_micro", "n_sources")
    )


def _init_registers(log2m: int, portable_hash: bool = False):
    """Own-hash HLL registers for column ``v``: index = low log2m
    bits, rho = leading-zero rank of a 32-bit window of the remaining
    bits (w = 0 → the window's max rank + 1). The window is taken with
    integer bit arithmetic: ``floor(h / m)`` in doubles would drop the
    low ~10 bits of the 64-bit hash past the 53-bit mantissa and
    corrupt the high-rho tail.

    ``portable_hash`` swaps xxhash64 for the repo's dual-dialect
    md5-60-bit hash (entry_queries HASH60) so a DuckDB twin can state
    the identical registers — oracle harness only; production keeps
    xxhash64 (one JVM intrinsic vs an md5 + string slice per node).
    """
    m = 1 << log2m
    if portable_hash:
        h = F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10).cast("bigint")
    else:
        h = F.xxhash64(F.col("v"))
    idx = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, log2m).bitwiseAND(F.lit((1 << 32) - 1))
    rho = (
        F.when(w == 0, F.lit(33))
        .otherwise(F.lit(32) - F.floor(F.log2(w.cast("double"))))
        .cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == idx, rho).otherwise(F.lit(0)),
    )


def _merge_regs(col):
    """Element-wise max fold over a collect_list of register arrays."""
    return F.aggregate(
        col,
        F.lit(None).cast("array<int>"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.zip_with(acc, x, lambda a, b: F.greatest(a, b))
        ),
    )


def _two_phase_max(state: DataFrame, m: int, n_salts: int) -> DataFrame:
    # the element-wise max is associative+commutative, so ANY salt
    # assignment yields the same merged registers; partition id keeps
    # each partial group bounded by its partition's contribution
    salted = state.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = salted.groupBy("v", "_salt").agg(
        _merge_regs(F.collect_list("regs")).alias("regs")
    )
    return partial.groupBy("v").agg(
        _merge_regs(F.collect_list("regs")).alias("regs")
    )


def _estimate(m: int):
    """HLL count estimate from a register array, with the
    linear-counting small-range correction."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_inv = F.aggregate(
        F.col("regs"),
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    zeros = F.size(F.filter(F.col("regs"), lambda r: r == 0))
    raw = F.lit(alpha * m * m) / s_inv
    return F.when(
        (zeros > 0) & (raw < 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)


def hyperball_harmonic(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    log2m: int = 8,
    max_iters: int = 16,
    n_salts: int = 32,
    portable_hash: bool = False,
) -> DataFrame:
    """(host, harmonic_est, ball_est) — HyperBall approximate harmonic
    centrality and final neighborhood-ball size estimate. Standard
    error ~ 1.04/sqrt(2^log2m) per count (log2m=8 → ~6.5%).

    Deterministic end to end: registers come from a hash of the node
    id, merges are element-wise max, and the early stop fires only
    when the (monotone) global register sum is unchanged — so a
    fixed-iteration replay produces bit-identical output, which is
    what the ``hyperball_harmonic`` oracle entry exploits
    (``portable_hash=True`` + a DuckDB twin of the same recurrence)."""
    m = 1 << log2m
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    state = nodes.select(
        F.col("u").alias("v"),
        _init_registers(log2m, portable_hash=portable_hash).alias("regs"),
    ).localCheckpoint(eager=True)
    # running per-host accumulators: previous ball estimate N_{k-1}
    # (starts at the k=0 self-ball) and the harmonic partial sum
    harm = state.select(
        "v",
        _estimate(m).alias("n_prev"),
        F.lit(0.0).alias("h"),
    ).localCheckpoint(eager=True)
    prev_checksum = None
    for k in range(1, max_iters + 1):
        contrib = state.join(e, state["v"] == e["u"]).select(
            e["v"].alias("v"), state["regs"].alias("regs")
        )
        state = _two_phase_max(
            state.union(contrib), m, n_salts
        ).localCheckpoint(eager=True)
        chk = state.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.aggregate(
                F.col("regs"), F.lit(0), lambda a, r: a + r
            )).alias("s"),
        ).collect()[0]
        cur = (chk["n"], chk["s"])
        est = state.select("v", _estimate(m).alias("n_k"))
        harm = (
            harm.join(est, "v")
            .select(
                "v",
                F.col("n_k").alias("n_prev"),
                (
                    F.col("h")
                    + F.greatest(F.col("n_k") - F.col("n_prev"), F.lit(0.0))
                    / F.lit(float(k))
                ).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        if cur == prev_checksum:
            break
        prev_checksum = cur
    return harm.select(
        F.col("v").alias("host"),
        F.col("h").alias("harmonic_est"),
        F.col("n_prev").alias("ball_est"),
    )
