"""Exact substring deduplication (the third dedup granularity).

Document-level dedup (MinHash/SimHash, operators/dedup.py) and
line-level dedup (CCNet, operators/linedup.py) miss the middle case a
web-text corpus is full of: long verbatim spans (licenses, boilerplate
paragraphs, quoted articles) embedded inside otherwise-distinct
documents. The ExactSubstr pass of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (2022) removes such spans; their
implementation builds a suffix array over the whole corpus, which is
the wrong shape for a shuffle-based engine. This module computes the
same signal with the canonical Spark shape:

  positional n-gram hashes (scan-local higher-order functions; one
  portable 60-bit hash per token position)
  -> ONE groupBy(gram_hash) count (map-side partial aggregation; rows
     leaving a partition are distinct grams, never token count)
  -> join positions back to grams with count >= min_count (shuffle
     equi-join co-partitioned on gram_hash; heavy-hitter boilerplate
     grams are exactly what AQE skew-split handles)
  -> per-document gaps-and-islands merge of overlapping [pos, pos+n)
     spans (window over doc_id — each doc's spans merge inside its
     own partition).

A doc's flagged spans are maximal duplicated regions of >= n tokens
(every length-n window inside them occurs >= min_count times corpus-
wide). ``strip_duplicated_spans`` removes all flagged spans with
array expressions (no Python); callers wanting Lee et al.'s keep-one-
occurrence policy can exempt per-gram minimal (doc_id, pos) rows from
the spans table before stripping — the spans are data, the policy is a
join.

Scale: token-positional grams are the big intermediate (one row per
token). Everything that touches them is either scan-local or a single
hash-partitioned exchange on gram_hash; the merge window shuffles one
row per DUPLICATED position only. At 10^10 documents the dup-hash set
(count >= 2) is typically small enough that Spark's AQE converts the
join-back to a broadcast automatically when it is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text, portable_hash64


def ngram_position_hashes(
    docs: DataFrame, n: int = 8, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """(doc_id, pos, gram_hash): the 64-bit hash of the word n-gram
    starting at each token position of the normalized text.
    Scan-local: split -> sequence -> transform -> posexplode, no
    shuffle; empty docs (split('') == ['']) emit nothing because
    n_grams = n_tok - n + 1 <= 0 for them at any n >= 2.

    ``portable=True`` uses the md5-based 60-bit hash reproducible in
    DuckDB (the entry oracle); the default is JVM xxhash64 — same
    collision story, no md5 per token position (the hot cost of this
    operator at corpus scale)."""
    if n < 2:
        raise ValueError("n must be >= 2 (n=1 is token counting)")
    toks = docs.select(
        "doc_id", F.split(normalized_text(F.col(text_col)), " ").alias("toks")
    )
    n_grams = F.size("toks") - F.lit(n - 1)
    idx = F.when(n_grams >= 1, F.sequence(F.lit(0), n_grams - 1)).otherwise(
        F.array().cast("array<int>")
    )
    hasher = portable_hash64 if portable else F.xxhash64
    grams = F.transform(
        idx,
        lambda i: hasher(
            F.concat_ws(
                " ", *[F.element_at("toks", (i + j + 1).cast("int")) for j in range(n)]
            )
        ),
    )
    return toks.select("doc_id", F.posexplode(grams).alias("pos", "gram_hash"))


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal merged token spans whose
    every length-n window occurs >= min_count times corpus-wide
    (within- and cross-document occurrences both count, as in Lee et
    al.'s ExactSubstr). span_end is exclusive; touching/overlapping
    windows merge into one span."""
    grams = ngram_position_hashes(docs, n=n, text_col=text_col, portable=portable)
    dup_hashes = (
        grams.groupBy("gram_hash")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("gram_hash")
    )
    dup_pos = grams.join(dup_hashes, "gram_hash").select(
        "doc_id", "pos", (F.col("pos") + n).alias("win_end")
    )
    # gaps-and-islands: a window starts a new span iff it begins after
    # every previous window's end (pos > running max end)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_pos.withColumn(
        "new_span",
        (F.col("pos") > F.coalesce(F.max("win_end").over(w), F.lit(-1))).cast("int"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("span_id", F.sum("new_span").over(w_run))
    return (
        islands.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("win_end").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def strip_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, clean_text, n_removed_tokens): the normalized text with
    every flagged span's tokens removed — the aggressive arm (all
    occurrences stripped; exempt rows from ``spans`` first for a
    keep-one policy). Array higher-order functions end to end: the
    token filter runs inside the scan task, no Python."""
    span_arr = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = docs.select(
        "doc_id", F.split(normalized_text(F.col(text_col)), " ").alias("toks")
    )
    joined = toks.join(span_arr, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    indexed = F.transform(
        "toks", lambda x, i: F.struct(x.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            "_spans",
            lambda sp: (sp["span_start"] <= s["i"]) & (s["i"] < sp["span_end"]),
        ),
    )
    # size(toks) - size(kept) is correct for empty docs too: split('')
    # == [''] contributes the same phantom element to both sides
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("clean_text"),
        (F.size("toks") - F.size(kept)).cast("int").alias("n_removed_tokens"),
    )
