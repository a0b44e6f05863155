"""Corpus-wide n-gram statistics: count tables, top-k grams, and
document frequencies.

Why a training-data engine needs this: the corpus n-gram table is the
raw material behind (a) boilerplate discovery ("which 5-grams appear in
40% of pages" — the signal C4's line filters and our
operators/linedup.py approximate), (b) tokenizer diagnostics (BPE
training in operators/bpe.py consumes word counts; gram tables say what
the vocabulary misses), (c) contamination forensics (which benchmark
grams actually collide, operators/decontaminate.py tells you *that*,
this tells you *what*), and (d) plain corpus cards (top phrases per
language/source).

Scale shape: the gram multiset is built scan-locally with higher-order
functions (split -> transform -> explode, reusing
operators/dedup.word_shingles — no Python, no pre-shuffle), and every
aggregation is a map-side-combined groupBy on the gram itself. Top-k
uses ``orderBy(...).limit(k)``, which Spark plans as a distributed
TakeOrdered (per-partition top-k, merge on the driver) — NOT a global
sort; same device as operators/lm.train_unigram_lm's vocab cut. Ties
break lexicographically so results are deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import word_shingles


def ngram_counts(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """(gram, count): corpus-wide occurrence counts of word ``n``-grams
    over the normalized text (multiset — a gram repeating inside one
    doc counts each time). One map-side-combined shuffle on the gram."""
    grams = word_shingles(docs, n=n, text_col=text_col, distinct=False)
    return grams.groupBy(F.col("shingle").alias("gram")).agg(
        F.count("*").cast("long").alias("count")
    )


def ngram_doc_frequency(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """(gram, df): number of DISTINCT documents containing each gram —
    the boilerplate-discovery signal (high df / low count-per-doc =
    template text). Distinct-per-doc happens scan-side via the
    word_shingles distinct arm before the gram shuffle."""
    grams = word_shingles(docs, n=n, text_col=text_col, distinct=True)
    return grams.groupBy(F.col("shingle").alias("gram")).agg(
        F.count("*").cast("long").alias("df")
    )


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """(gram, count, rnk): the ``k`` most frequent word n-grams, ties
    broken lexicographically. TakeOrdered plan — never a global sort."""
    ranked = (
        ngram_counts(docs, n=n, text_col=text_col)
        .orderBy(F.col("count").desc(), F.col("gram").asc())
        .limit(k)
    )
    # rnk assigned AFTER the limit: the window sees <= k rows on the driver
    # side of the TakeOrdered, not the full gram table
    from pyspark.sql import Window

    w = Window.orderBy(F.col("count").desc(), F.col("gram").asc())
    return ranked.withColumn("rnk", F.row_number().over(w).cast("int"))


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_doc_frac: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """(gram, df, doc_frac): grams appearing in at least ``min_doc_frac``
    of all documents — template/boilerplate phrase candidates to feed
    line- or span-level cleaners. doc_frac is exact (long df over long
    total), rounded to 6 decimals."""
    import math

    total = docs.count()
    threshold = max(1, math.ceil(min_doc_frac * total - 1e-9))
    dfreq = ngram_doc_frequency(docs, n=n, text_col=text_col)
    return (
        dfreq.withColumn(
            "doc_frac", F.round(F.col("df") / F.lit(float(total)), 6)
        )
        .filter(F.col("df") >= F.lit(threshold))
        .select("gram", "df", "doc_frac")
    )


def word_frequency_spectrum(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(k_bucket, n_types, n_tokens): the word-frequency spectrum —
    how many distinct words (types) occur with a corpus frequency in
    [2^k, 2^(k+1)), and how many running tokens those words account
    for.

    This is the corpus-QA companion to ``top_ngrams``: a healthy
    natural-language crawl follows Zipf (log-linear spectrum, a long
    k=0 hapax tail holding ~half the types); template farms and
    machine-generated spam bend it (hapax collapse, mid-k bulges), and
    tokenizer planning reads vocabulary-coverage-per-budget straight
    off the cumulative token column.

    Shapes: the word table is the SAME one distributed stage BPE
    training consumes (scan-local split/explode, one map-side-combined
    groupBy on the word); the spectrum reduce is a second tiny groupBy
    on the bucket. The bucket is ``length(bin(count)) - 1`` — exact
    integer log2 with no float-at-the-boundary hazard (the DuckDB twin
    uses printf('%b')).
    """
    from pathik_spark.operators.dedup import normalized_text

    norm = normalized_text(F.col(text_col))
    words = docs.select(
        F.explode(
            F.when(norm == "", F.array()).otherwise(F.split(norm, " "))
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count("*").alias("c"))
    bucket = (F.length(F.bin(F.col("c"))) - 1).cast("int")
    return counts.groupBy(bucket.alias("k_bucket")).agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
