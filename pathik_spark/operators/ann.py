"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query set is small and broadcast; the dot product runs JVM-side
  via ``zip_with`` + ``aggregate`` higher-order functions (no Python,
  no shuffle of the corpus beyond the final per-query top-k window).
- ``lsh_bucketed_topk``: the scale path — sign-random-projection LSH.
  Hyperplanes are *deterministic* pseudo-random vectors derived from
  xxhash64(plane, dim) so the plan is replayable with no driver-side
  randomness. Buckets equi-join; top-k within bucket candidates.
  Recall<1 by construction; multi-probe = more planes/tables.

Double-precision math throughout (cast before multiply) so results are
stable and comparable against the DuckDB oracle to 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, score, rank). Ties break
    by vec_id for determinism; self-matches excluded when ids collide."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    corpus = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = corpus.join(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qvec"), F.col("vec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _hyperplane_sign(vec, plane: int, dim: int):
    """sign(<vec, h_plane>) with h_plane[d] = xxhash64(plane,d) mapped to
    [-1,1) — deterministic, computed inline, never materialized."""
    comps = [
        F.element_at(vec, d + 1).cast("double")
        * ((F.xxhash64(F.lit(plane), F.lit(d)) % F.lit(10_000_019)).cast("double") / F.lit(10_000_019.0))
        for d in range(dim)
    ]
    total = comps[0]
    for c in comps[1:]:
        total = total + c
    return (total >= 0).cast("int")


def lsh_bucket_expr(vec, n_planes: int, dim: int):
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p, dim)
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket."""
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket_expr(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = corpus.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qvec"), F.col("vec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold. exact=True does the
    all-pairs join (oracle-comparable); default blocks by LSH bucket."""
    base = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    if not exact:
        base = base.withColumn("bucket", lsh_bucket_expr(F.col("vec"), n_planes, dim))
        cond_cols = ["bucket"]
    else:
        base = base.withColumn("bucket", F.lit(0))
        cond_cols = ["bucket"]
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), 6).alias("score"),
    )
    return pairs.filter(F.col("score") >= threshold)
