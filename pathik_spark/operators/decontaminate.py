"""Benchmark decontamination for training corpora.

Before pretraining, every document whose n-grams overlap a held-out
evaluation benchmark must be dropped (or flagged) — otherwise the model
is graded on data it memorized. The standard recipe (GPT-3 appendix C,
PaLM, Llama: 8-13-gram collision against the benchmark) is:

  1. fingerprint the benchmark as the DISTINCT set of word n-gram
     hashes;
  2. for each corpus document, count how many of ITS distinct n-grams
     collide with that set;
  3. drop documents whose collision count exceeds a threshold
     (default: any collision).

Scale shape (the whole point): the benchmark side is always tiny —
benchmarks are megabytes while the corpus is 100 TB — so the collision
check is a BROADCAST semi/left join keyed by n-gram hash. The corpus
side never shuffles: shingling, hashing, the broadcast probe, and the
per-doc counts (partial aggregation keyed by doc_id, already co-located
with the scan) all happen inside the scan tasks. No stage in this
module exchanges corpus-sized data.

Hash families mirror operators/dedup.py: xxhash64 for production, the
md5-based portable 60-bit hash for the DuckDB-oracled entry query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import portable_hash64, word_shingles

DEFAULT_NGRAM = 8


def _shingle_hashes(
    docs: DataFrame, n: int, text_col: str, portable: bool
) -> DataFrame:
    """(doc_id, ngram_hash) — distinct hashed word n-grams per doc."""
    sh = word_shingles(docs, n=n, text_col=text_col)
    h = (
        portable_hash64(F.col("shingle"))
        if portable
        else F.xxhash64(F.col("shingle"))
    )
    return sh.select("doc_id", h.alias("ngram_hash"))


def benchmark_fingerprints(
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """DISTINCT n-gram hash set of the benchmark corpus — the (small)
    build side of the decontamination probe."""
    return (
        _shingle_hashes(benchmark, n, text_col, portable)
        .select("ngram_hash")
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    max_collisions: int = 0,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Per-document contamination report against a benchmark table.

    Returns (doc_id, n_ngrams, n_collisions, contaminated, keep):
      - n_ngrams: distinct word n-grams in the document;
      - n_collisions: how many of those appear anywhere in the
        benchmark;
      - contaminated: n_collisions > max_collisions;
      - keep: the inverse (the cleaning-gate column, same convention as
        operators/quality.py).

    Documents shorter than n tokens have zero n-grams and are kept
    (nothing to collide). The benchmark side is explicitly
    ``F.broadcast``-ed: the corpus side stays in its scan tasks and the
    only shuffle in the plan is the per-doc count's partial-agg
    combine, keyed by doc_id.
    """
    doc_ngrams = _shingle_hashes(docs, n, text_col, portable)
    bench = benchmark_fingerprints(benchmark, n=n, text_col=text_col, portable=portable)

    hits = (
        doc_ngrams.join(F.broadcast(bench), "ngram_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_collisions"))
    )
    totals = doc_ngrams.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))

    report = (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
        )
    )
    contaminated = F.col("n_collisions") > max_collisions
    return report.select(
        "doc_id",
        "n_ngrams",
        "n_collisions",
        contaminated.alias("contaminated"),
        (~contaminated).alias("keep"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    max_collisions: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """The filtered corpus: docs with contamination()'s keep == true."""
    report = contamination(
        docs, benchmark, n=n, max_collisions=max_collisions, text_col=text_col
    )
    return docs.join(report.filter("keep").select("doc_id"), "doc_id", "left_semi")


def retrieval_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 10,
    min_score: float = 0.0,
    n_salts: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Retrieval-based contamination audit: the RECALL companion to the
    n-gram collision check above. Exact n-gram overlap misses reworded
    or partially quoted benchmark items; BM25 retrieval over the corpus
    (operators/search.py) surfaces the documents most lexically similar
    to EACH benchmark item even without an exact 8-gram hit — the
    "search the training set for the test set" audit that recent
    contamination studies run.

    Each benchmark item becomes a BM25 query (distinct normalized
    terms, broadcast); the corpus is the index. Returns
    (bench_id, doc_id, score, rnk): the top-``k`` corpus docs per item
    with score >= ``min_score`` — a human-reviewable audit table, or a
    drop list via ``retrieval_decontaminate``. Inherits bm25_topk's
    scale shape: the only corpus-wide work is the index build; scoring
    runs on the term-pruned candidate set. Use ``n_salts`` > 0 when
    benchmark items contain very common terms.
    """
    from pathik_spark.operators.search import bm25_topk

    queries = benchmark.select(
        F.col(bench_id_col).alias("query_id"), F.col(bench_text_col).alias("query")
    )
    hits = bm25_topk(
        corpus, queries, k=k, n_salts=n_salts, text_col=text_col, id_col=id_col
    )
    return hits.filter(F.col("score") >= F.lit(min_score)).select(
        F.col("query_id").alias("bench_id"), "doc_id", "score", "rnk"
    )


def retrieval_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 10,
    min_score: float = 0.0,
    n_salts: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Drop every corpus document flagged by the retrieval audit: the
    flagged id set is at most |benchmark| * k rows — broadcast
    anti-join, the corpus never shuffles for the removal."""
    flagged = retrieval_contamination(
        corpus,
        benchmark,
        k=k,
        min_score=min_score,
        n_salts=n_salts,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
