"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query set is small and broadcast; the dot product runs JVM-side
  via ``zip_with`` + ``aggregate`` higher-order functions (no Python,
  no shuffle of the corpus beyond the final per-query top-k window).
- ``lsh_bucketed_topk``: the scale path — sign-random-projection LSH.
  Hyperplanes are a *deterministic* Gaussian matrix (fixed-seed PCG64 —
  bit-stable across machines/runs, no driver-side randomness), broadcast
  implicitly in the UDF closure (n_planes x dim doubles — a few KB even
  at dim=4096). Bucketing is ONE numpy matmul per Arrow batch: at
  dim=768 the round-1 expression formulation inlined ~4,600 plan terms
  per column (plan-compile blowup); the matmul path is O(1) plan size at
  any dim. Buckets equi-join; top-k within bucket candidates. Recall<1
  by construction (recall floor property-tested vs brute force);
  multi-probe = more planes/tables.

Double-precision math throughout (cast before multiply) so results are
stable and comparable against the DuckDB oracle to 1e-6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


_HYPERPLANE_SEED = 90210


def hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic Gaussian SRP hyperplanes (n_planes x dim). PCG64
    with a fixed seed is bit-stable across platforms, so the bucketing
    is replayable with no materialized random state."""
    return np.random.default_rng(_HYPERPLANE_SEED).standard_normal((n_planes, dim))


def make_lsh_bucket_udf(n_planes: int, dim: int):
    """Vectorized SRP bucketing: ONE (batch x dim) @ (dim x n_planes)
    matmul per Arrow batch; sign bits pack into an int bucket id.
    Plan size is O(1) in dim (the round-1 expression form was O(dim *
    n_planes) — unusable at real embedding widths)."""
    planes_t = hyperplanes(n_planes, dim).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.IntegerType())
    def lsh_bucket(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vec.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (mat @ planes_t) >= 0.0
        return pd.Series((signs @ weights).astype(np.int32))

    return lsh_bucket


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
    bucket_udf = make_lsh_bucket_udf(n_planes, dim)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket_udf(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        bucket_udf(F.col(vec_col)).alias("bucket"),
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


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


# Above this many partial doubles (partitions x centroids x dim) the
# per-iteration reduce shuffles (cid, pos) instead of collecting the
# raw partials to the driver (~128 MB of doubles).
_IVF_DRIVER_COMBINE_MAX_DOUBLES = 1 << 24


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer for cosine space.

    Initial centroids are the ``n_centroids`` corpus vectors with the
    smallest ``xxhash64(vec_id)`` — a deterministic uniform sample with
    no RNG state to materialize. ``n_iters`` spherical-Lloyd steps
    refine them; each step is fully distributed:

      assign (one matmul-argmax per Arrow batch)
      -> ONE partial (cid, sum_vec, n) row-set per PARTITION via
         mapInPandas (accumulated across the partition's batches —
         rows leaving a partition are O(n_centroids), never O(corpus)
         and never O(batches))
      -> reduce: collected straight to the driver and summed in numpy
         when partitions x centroids x dim is small (the common case —
         one job, no shuffle); above _IVF_DRIVER_COMBINE_MAX_DOUBLES
         the partials posexplode and groupBy (cid, pos) so the driver
         only ever sees n_centroids x dim floats.

    The projected corpus is cached for the duration of training (init
    sample + every Lloyd pass re-reads it; at bench scale the re-scan
    + re-project otherwise dominates) and unpersisted before return.

    The returned (n_centroids, dim) array is row-normalized (spherical
    k-means) and small enough to broadcast in a UDF closure at any
    realistic (n_centroids, dim)."""
    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).persist()
    try:
        init = (
            base.withColumn("_h", F.xxhash64(F.col("vid")))
            .orderBy("_h", "vid")
            .limit(n_centroids)
            .select("vec")
            .collect()
        )
        cents = _normalize_rows(np.array([r["vec"] for r in init], dtype=np.float64))

        out_schema = T.StructType(
            [
                T.StructField("cid", T.IntegerType()),
                T.StructField("psum", T.ArrayType(T.DoubleType())),
                T.StructField("n", T.LongType()),
            ]
        )
        vecs = base.select("vec")
        n_parts = vecs.rdd.getNumPartitions()
        driver_combine = (
            n_parts * n_centroids * dim <= _IVF_DRIVER_COMBINE_MAX_DOUBLES
        )
        for _ in range(n_iters):
            cents_t = cents.T  # closure-captured (dim, n_centroids)

            def partials(batches, _ct=cents_t):
                # one accumulator per partition: sums/counts over ALL of
                # the partition's Arrow batches, emitted once at the end
                sums = np.zeros((_ct.shape[1], _ct.shape[0]))
                counts = np.zeros(_ct.shape[1], dtype=np.int64)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    mat = _normalize_rows(
                        np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                    )
                    cid = np.argmax(mat @ _ct, axis=1)
                    np.add.at(sums, cid, mat)
                    np.add.at(counts, cid, 1)
                hit = np.nonzero(counts)[0]
                yield pd.DataFrame(
                    [(int(c), sums[c].tolist(), int(counts[c])) for c in hit],
                    columns=["cid", "psum", "n"],
                )

            part_df = vecs.mapInPandas(partials, out_schema)
            new = cents.copy()  # empty clusters keep their previous centroid
            if driver_combine:
                acc = np.zeros((n_centroids, dim))
                counts_v = np.zeros(n_centroids, dtype=np.int64)
                for r in part_df.collect():
                    acc[r["cid"]] += np.asarray(r["psum"])
                    counts_v[r["cid"]] += r["n"]
                for c in np.nonzero(counts_v)[0]:
                    new[c] = acc[c] / counts_v[c]
            else:
                agg = (
                    part_df.select("cid", "n", F.posexplode("psum").alias("pos", "v"))
                    .groupBy("cid", "pos")
                    .agg(F.sum("v").alias("s"), F.sum("n").alias("n"))
                    .collect()
                )
                acc_d: dict[int, np.ndarray] = {}
                counts_d: dict[int, int] = {}
                for r in agg:
                    acc_d.setdefault(r["cid"], np.zeros(dim))[r["pos"]] = r["s"]
                    counts_d[r["cid"]] = r["n"]  # same total per pos of a cid
                for c, row in acc_d.items():
                    if counts_d[c] > 0:
                        new[c] = row / counts_d[c]
            cents = _normalize_rows(new)
        return cents
    finally:
        base.unpersist()


def make_ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """cid assignment (nprobe=1) or nprobe-nearest centroid list: one
    matmul per Arrow batch against the normalized centroid matrix."""
    cents_t = _normalize_rows(centroids.astype(np.float64)).T

    if nprobe == 1:

        @F.pandas_udf(T.IntegerType())
        def assign(vec: pd.Series) -> pd.Series:
            if len(vec) == 0:
                return pd.Series([], dtype="int32")
            mat = _normalize_rows(np.stack(vec.to_numpy()).astype(np.float64))
            return pd.Series(np.argmax(mat @ cents_t, axis=1).astype(np.int32))

        return assign

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign_n(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        mat = _normalize_rows(np.stack(vec.to_numpy()).astype(np.float64))
        sims = mat @ cents_t
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in top])

    return assign_n


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path beside LSH.

    Corpus vectors are assigned to their nearest coarse centroid (one
    int column — at 10^10 rows this is the partition key an Iceberg
    layout would bucket by, so a probe scans only nprobe/n_centroids of
    the corpus). Queries explode to their ``nprobe`` nearest centroids
    and equi-join the corpus on cid — broadcast (queries are small), no
    corpus shuffle. Exact cosine re-ranks within the probed cells.
    Recall < 1 by construction; raise ``nprobe`` to trade compute for
    recall (property-tested floor vs brute force)."""
    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_centroids, dim, id_col=id_col, vec_col=vec_col
        )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        make_ivf_assign_udf(centroids, 1)(F.col(vec_col)).alias("cid"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(make_ivf_assign_udf(centroids, nprobe)(F.col(vec_col))).alias("cid"),
    )
    scored = corpus.join(F.broadcast(q), "cid").filter(
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
        base = base.withColumn("bucket", make_lsh_bucket_udf(n_planes, dim)(F.col("vec")))
    else:
        base = base.withColumn("bucket", F.lit(0))
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


def semdedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication — cluster
    the embedding space coarsely, compute exact pairwise cosine only
    WITHIN each cluster, and keep one representative per near-duplicate
    group. Returns (vec_id, cluster, keep): ``keep`` is False iff the
    vector has a same-cluster neighbor with cosine >= threshold and a
    smaller id — the deterministic "keep the lowest id" tie-break, so
    exactly one member of every duplicate chain survives per cluster.

    Two clustering arms share the downstream plan:

    - default: SRP LSH buckets (deterministic literal hyperplanes) —
      fully relational, DuckDB-oracleable (`semdedup` entry);
    - ``centroids`` given: k-means cells (the published method's
      clustering; train with :func:`ivf_centroids`) — at 10^10 vectors
      the cid is the layout key, so each cluster's quadratic pair join
      stays inside one partition's worth of data.

    The within-cluster self-join is the intended quadratic: SemDeDup's
    whole point is that clusters bound the pair blow-up (cluster sizes
    are ~corpus/n_clusters; skewed mega-clusters split via AQE skew
    join on the cluster key).
    """
    base = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    if centroids is not None:
        base = base.withColumn(
            "cluster", make_ivf_assign_udf(centroids, 1)(F.col("vec")).cast("int")
        )
    else:
        base = base.withColumn(
            "cluster", make_lsh_bucket_udf(n_planes, dim)(F.col("vec")).cast("int")
        )
    a, b = base.alias("a"), base.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .filter(
            F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), 6) >= threshold
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        base.select("vid", "cluster")
        .join(dropped, "vid", "left")
        .select(
            F.col("vid").alias("vec_id"),
            "cluster",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


_PROJECTION_SEED = 20260819


def projection_matrix(out_dim: int, dim: int, seed: int = _PROJECTION_SEED) -> np.ndarray:
    """Deterministic Achlioptas sparse JL projection (dim x out_dim):
    entries sqrt(3/out_dim) * {+1 w.p. 1/6, 0 w.p. 2/3, -1 w.p. 1/6}
    (Achlioptas 2003 — database-friendly random projections; public).
    PCG64 with a fixed seed is bit-stable across platforms, so the
    reduction is replayable with no materialized matrix state, and the
    2/3 sparsity makes the oracle's literal-matrix restatement small."""
    rng = np.random.default_rng(seed)
    u = rng.random((dim, out_dim))
    signs = np.where(u < 1.0 / 6.0, 1.0, np.where(u < 1.0 / 3.0, -1.0, 0.0))
    return signs * np.sqrt(3.0 / out_dim)


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = _PROJECTION_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro_exact: bool = False,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction for embedding
    columns: (vec_id, embedding[out_dim]) with pairwise distances
    preserved to within the JL distortion bound. The cheap pre-pass
    before any distance-heavy stage — brute-force cosine, IVF training,
    SemDeDup — when the raw width (768-4096) dominates their cost.

    Same execution shape as the SRP bucketing above: ONE
    (batch x dim) @ (dim x out_dim) numpy matmul per Arrow batch,
    scan-local, O(1) plan size in both widths. Components are kept at
    full double precision.

    ``micro_exact=True`` switches to the repo's integer-micro exactness
    device: each product v_i*m_ij is rounded (half away from zero) to
    micro units BEFORE the sum, so the component is an associative
    integer sum — bit-identical cross-engine/partitioning, which the
    `random_projection` DuckDB oracle relies on (BLAS matmul and SQL
    SUM associate doubles differently; 6-dp rounding of two sums an
    ulp apart on a .5 boundary would otherwise disagree). Costs a
    chunked (rows x dim x out_dim) intermediate — the ORACLE arm;
    production keeps the pure matmul.
    """
    mat = projection_matrix(out_dim, dim, seed)  # (dim, out_dim)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        batch = np.stack(vec.to_numpy()).astype(np.float64)  # (batch, dim)
        if not micro_exact:
            return pd.Series(list(batch @ mat))
        out = np.empty((batch.shape[0], out_dim))
        chunk = max(1, (1 << 22) // (dim * out_dim))  # <= ~32 MB intermediate
        for s in range(0, batch.shape[0], chunk):
            prods = batch[s : s + chunk, :, None] * mat[None, :, :] * 1e6
            micro = (np.sign(prods) * np.floor(np.abs(prods) + 0.5)).astype(np.int64)
            out[s : s + chunk] = micro.sum(axis=1) / 1e6
        return pd.Series(list(out))

    return embeddings.select(
        F.col(id_col).alias("vec_id"), project(F.col(vec_col)).alias("embedding")
    )
