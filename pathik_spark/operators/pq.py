"""Product quantization (PQ): embedding compression + ADC ANN search.

The third ANN arm beside LSH and IVF (operators/ann.py), and the one
that changes the 100 TB storage equation: a 10^10 x 768-float32
embedding corpus is ~30 TB of vectors, while PQ codes at 8 subspaces x
256 codes are 8 BYTES per vector (~80 GB) — the approximate-distance
scan reads ONLY the code column; float vectors are touched again only
to re-rank the few candidates that survive. This is the FAISS
IVFADC/DiskANN storage shape re-expressed as DataFrame ops:

- ``pq_codebooks``: deterministic per-subspace Lloyd k-means trained on
  a hash-ordered sample collected to the driver. The sample is
  O(n_codes * PQ_TRAIN_OVERSAMPLE) rows regardless of corpus size
  (driver-safe at 10^10 rows); the codebooks are
  (n_subspaces, n_codes, sub_dim) doubles — a few MB at most, shipped
  as a UDF closure (implicit broadcast).
- ``pq_encode``: one (batch x sub_dim) @ (sub_dim x n_codes) matmul +
  argmin per subspace per Arrow batch -> ``array<int>`` codes.
  Scan-local: no shuffle, O(1) plan size in dim.
- ``pq_adc_topk``: asymmetric distance computation. Per query a LUT of
  (n_subspaces x n_codes) partial inner products is built driver-side
  (tiny numpy) and closure-broadcast; scoring gathers LUT rows per code
  column and sums — never touching float vectors. Each partition emits
  only its local top-C candidates per query (O(partitions x n_q x C)
  rows cross the shuffle, never O(corpus)); a window keeps the global
  top-C; optional exact cosine re-rank joins the tiny candidate set
  back to the float vectors.

Exact-limit oracle (the ``ivf_ann_exact_probe`` trick, ann.py): with
``rerank=True`` and ``n_candidates`` >= corpus size the ADC stage keeps
every row, so the result equals brute-force cosine top-k INDEPENDENT of
the trained codebooks — the full train/encode/LUT/ADC machinery runs,
but the float k-means never needs a relational restatement. Recall at
real candidate budgets is property-tested against brute force.

Reference parity note: the reference (justrach/pathik) has no vector
search; this family is part of the training-data-pipeline brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathik_spark.operators.ann import _normalize_rows, cosine_expr

# Training-sample budget: rows collected to the driver per training
# call, independent of corpus size.
PQ_TRAIN_OVERSAMPLE = 64
PQ_TRAIN_MAX_SAMPLE = 1 << 15


def pq_codebooks(
    embeddings: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    n_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train (n_subspaces, n_codes, dim // n_subspaces) codebooks.

    Sampling is the same deterministic device as ivf_centroids: the
    rows with the smallest ``xxhash64(vec_id)`` — a uniform,
    RNG-state-free sample that is replayable on resume. Vectors are
    L2-normalized BEFORE splitting (cosine space: ADC then approximates
    the cosine numerator directly). Per subspace, Lloyd iterations run
    in numpy on the driver sample; empty clusters keep their previous
    centroid (same convention as ivf_centroids). n_codes is clamped to
    the number of distinct sampled subvectors when the corpus is tiny.
    """
    if dim % n_subspaces != 0:
        raise ValueError(f"dim={dim} not divisible by n_subspaces={n_subspaces}")
    sub_dim = dim // n_subspaces
    sample_n = min(max(n_codes * PQ_TRAIN_OVERSAMPLE, 1024), PQ_TRAIN_MAX_SAMPLE)
    pdf = (
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("_h", F.xxhash64(F.col("vid")))
        .orderBy("_h", "vid")
        .limit(sample_n)
        .select("vec")
        .toPandas()  # Arrow transfer: ~10x cheaper than Row collect at 16k x 768
    )
    if len(pdf) == 0:
        raise ValueError("pq_codebooks: empty embeddings input")
    sample = _normalize_rows(np.stack(pdf["vec"].to_numpy()).astype(np.float64))
    books = np.zeros((n_subspaces, n_codes, sub_dim))
    for s in range(n_subspaces):
        sub = sample[:, s * sub_dim : (s + 1) * sub_dim]
        uniq = np.unique(sub, axis=0)
        k = min(n_codes, len(uniq))
        cents = uniq[:k].copy()
        for _ in range(n_iters):
            # assign by L2: argmax(x.c - 0.5*|c|^2) == argmin |x - c|^2
            scores = sub @ cents.T - 0.5 * np.sum(cents * cents, axis=1)
            code = np.argmax(scores, axis=1)
            # vectorized Lloyd update (a per-cluster Python loop is the
            # training hotspot at n_codes=256); empty clusters keep
            # their previous centroid
            counts = np.bincount(code, minlength=k).astype(np.float64)
            sums = np.zeros((k, sub_dim))
            np.add.at(sums, code, sub)
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz, None]
        books[s, :k] = cents
        if k < n_codes:
            # pad duplicate rows so the array is rectangular; argmin
            # ties break to the lower index, so padding is inert
            books[s, k:] = cents[0]
    return books


def make_pq_encode_udf(codebooks: np.ndarray):
    """array<float> vector -> array<int> PQ codes, one matmul+argmin per
    subspace per Arrow batch. Vectors are normalized first (the
    codebooks were trained on normalized vectors)."""
    books = codebooks.astype(np.float64)
    n_subspaces, n_codes, sub_dim = books.shape
    # precompute -0.5*|c|^2 per (subspace, code) for the L2 argmin
    half_sq = 0.5 * np.sum(books * books, axis=2)  # (n_subspaces, n_codes)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        mat = _normalize_rows(np.stack(vec.to_numpy()).astype(np.float64))
        codes = np.empty((len(mat), n_subspaces), dtype=np.int32)
        for s in range(n_subspaces):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            codes[:, s] = np.argmax(sub @ books[s].T - half_sq[s], axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes): the compressed corpus — the column a 10^10-row
    layout persists beside (or instead of) the float vectors."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        make_pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_candidates: int | None = None,
    dim: int = 64,
    rerank: bool = True,
    codebooks: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ-ADC approximate top-k: (query_id, vec_id, score, rank).

    ``n_candidates`` (default 8*k) is the per-query candidate budget
    the ADC scan keeps for exact re-ranking; >= corpus size makes the
    result exactly brute-force (the oracle arm). ``rerank=False``
    returns the raw ADC approximation as the score (compressed-domain
    only — no float vector is ever read after encoding)."""
    if n_candidates is None:
        n_candidates = 8 * k
    if codebooks is None:
        codebooks = pq_codebooks(
            embeddings, n_subspaces, n_codes, dim, id_col=id_col, vec_col=vec_col
        )
    books = codebooks.astype(np.float64)
    n_subspaces, n_codes, sub_dim = books.shape

    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()  # queries are small by contract (same as brute_force_topk broadcast)
    if not qrows:
        return embeddings.sparkSession.createDataFrame(
            [],
            "query_id long, vec_id long, score double, rank int",
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qmat = _normalize_rows(
        np.array([r["qvec"] for r in qrows], dtype=np.float64)
    )  # (n_q, dim)
    # ADC lookup tables: luts[q, s, c] = q_sub . codebook[s, c]
    luts = np.empty((len(qids), n_subspaces, n_codes))
    for s in range(n_subspaces):
        luts[:, s, :] = qmat[:, s * sub_dim : (s + 1) * sub_dim] @ books[s].T

    encoded = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)
    cand_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )
    n_cand = int(n_candidates)

    def partition_topc(batches, _luts=luts, _qids=qids):
        # per-partition top-C per query over ALL the partition's
        # batches: rows leaving a partition are O(n_q * C), not O(rows)
        best_scores = [np.empty(0)] * len(_qids)
        best_ids = [np.empty(0, dtype=np.int64)] * len(_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (b, S)
            vids = pdf["vec_id"].to_numpy().astype(np.int64)
            # gather: scores[q, row] = sum_s luts[q, s, codes[row, s]]
            scores = np.zeros((len(_qids), len(codes)))
            for s in range(_luts.shape[1]):
                scores += _luts[:, s, codes[:, s]]
            for qi in range(len(_qids)):
                sc = np.concatenate([best_scores[qi], scores[qi]])
                ids = np.concatenate([best_ids[qi], vids])
                if len(sc) > n_cand:
                    keep = np.argpartition(-sc, n_cand - 1)[:n_cand]
                    sc, ids = sc[keep], ids[keep]
                best_scores[qi], best_ids[qi] = sc, ids
        out = []
        for qi in range(len(_qids)):
            for vid, sc in zip(best_ids[qi], best_scores[qi]):
                out.append((int(_qids[qi]), int(vid), float(sc)))
        yield pd.DataFrame(out, columns=["query_id", "vec_id", "adc"])

    local = encoded.mapInPandas(partition_topc, cand_schema).filter(
        F.col("vec_id") != F.col("query_id")
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cands = (
        local.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= n_cand)
        .drop("_r")
    )
    if not rerank:
        w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "vec_id", F.round("adc", 6).alias("score"), "rank"
            )
        )

    # exact re-rank: join the tiny candidate set back to float vectors
    # (broadcast the candidates — O(n_q * C) rows). The RAW query
    # vectors (not the normalized copies) feed cosine_expr so the
    # arithmetic is bit-identical to brute_force_topk's.
    qdf = embeddings.sparkSession.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["qvec"]]) for r in qrows],
        "query_id long, qvec array<double>",
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    joined = corpus.join(F.broadcast(cands), "vec_id").join(
        F.broadcast(qdf), "query_id"
    )
    scored = joined.select(
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
