"""Sequence chunking and token-stream packing for pretraining.

The last mile of a web-text pipeline: cleaned documents become
fixed-length training rows. Two operators:

- ``chunk_documents``: split each document's token sequence into
  windows of ``seq_len`` tokens every ``stride`` tokens (stride <
  seq_len gives overlapping context windows, BERT-style). Pure
  higher-order-function expressions — split / sequence / slice /
  array_join — so the fan-out happens inside the scan task that read
  the document. No shuffle, no Python.

- ``pack_token_stream``: GPT-style concat-and-split packing. The
  corpus is treated as one continuous token stream (documents
  concatenated in a deterministic order) cut every ``seq_len`` tokens;
  a document's tokens may straddle a cut. Emits one row per
  (document x pack it overlaps), with the in-doc token range and the
  in-pack offset — exactly the index a sequence-packing data loader
  materializes.

  Scale shape: a single global running sum would serialize on one
  partition, so the stream is SHARDED by a deterministic hash of
  doc_id into ``n_shards`` independent streams; the running sum's
  window partitions by shard (parallel), and pack ids are made
  globally unique as shard * 2^40 + local pack index. Each shard is a
  valid contiguous stream; packs never cross shards. The straddle
  fan-out (one doc -> the 1..k packs it overlaps) is a sequence()
  explode, again scan-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text, portable_hash64

PACK_SHARD_BITS = 40  # pack_id = shard << 40 | local_idx


def chunk_documents(
    docs: DataFrame,
    seq_len: int = 128,
    stride: int | None = None,
    min_tokens: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tok, chunk_text) — fixed-size
    token windows per document.

    Window i covers tokens [i*stride, i*stride + seq_len); the last
    window is short unless the doc length lands on the stride lattice.
    Windows shorter than ``min_tokens`` are dropped (trailing slivers).
    Tokens are whitespace tokens of the normalized text (the same
    tokenization every other text operator in the engine uses).
    """
    if stride is None:
        stride = seq_len
    if stride <= 0 or seq_len <= 0:
        raise ValueError("seq_len and stride must be positive")

    # split('') yields [''] (size 1), so n must special-case the empty
    # normalized doc to 0 — the report.py convention — or empty docs
    # would emit a phantom 1-token chunk
    toks = docs.select(
        "doc_id", normalized_text(F.col(text_col)).alias("_norm")
    ).select(
        "doc_id",
        F.split(F.col("_norm"), " ").alias("toks"),
        F.when(F.col("_norm") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("_norm"), " ")))
        .alias("n"),
    )
    # window starts: 0, stride, ... < n (empty docs produce no windows)
    starts = F.when(
        F.col("n") >= 1, F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = toks.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    n_tok = F.least(F.lit(seq_len), F.col("n") - F.col("start_tok"))
    return (
        exploded.withColumn("n_tok", n_tok)
        .filter(F.col("n_tok") >= min_tokens)
        .select(
            "doc_id",
            "chunk_idx",
            "start_tok",
            "n_tok",
            F.array_join(
                F.slice(F.col("toks"), F.col("start_tok") + 1, F.col("n_tok")), " "
            ).alias("chunk_text"),
        )
    )


def pack_token_stream(
    docs: DataFrame,
    seq_len: int = 128,
    n_shards: int = 64,
    text_col: str = "text",
    eos_tokens: int = 0,
) -> DataFrame:
    """Concat-and-split packing index.

    Returns one row per (doc, pack) overlap:
      (pack_id, doc_id, doc_tok_start, n_tok, pack_tok_start)
    meaning: tokens [doc_tok_start, doc_tok_start + n_tok) of doc_id
    land at offset pack_tok_start of pack pack_id. Every pack except
    each shard's last is exactly seq_len tokens of consecutive stream.

    Deterministic: stream order within a shard is doc_id order, shard
    assignment is a pure hash of doc_id — same rows, same packs, on
    any cluster size.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if eos_tokens < 0:
        raise ValueError("eos_tokens must be >= 0")

    # same empty-doc convention as chunk_documents/report.py: size 0,
    # not split('') == [''] (size 1) — a phantom token per empty doc
    # would otherwise leak into the packed stream
    norm = normalized_text(F.col(text_col))
    toks = docs.select(
        "doc_id",
        F.when(norm == "", F.lit(0))
        # eos_tokens: the trainer convention of a document separator
        # (e.g. one EOS) appended to every doc in the stream; each
        # doc's span (and its n_tok) includes its trailing separator
        .otherwise(F.size(F.split(norm, " ")) + F.lit(int(eos_tokens)))
        .alias("n_tok_doc"),
    ).filter(F.col("n_tok_doc") > F.lit(int(eos_tokens)))
    sharded = toks.withColumn(
        "shard", F.pmod(portable_hash64(F.col("doc_id").cast("string")), F.lit(n_shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = sharded.withColumn(
        "stream_end", F.sum("n_tok_doc").over(w)
    ).withColumn("stream_start", F.col("stream_end") - F.col("n_tok_doc"))

    # packs this doc overlaps: floor(start/L) .. floor((end-1)/L)
    first_pack = F.floor(F.col("stream_start") / seq_len)
    last_pack = F.floor((F.col("stream_end") - 1) / seq_len)
    packs = offs.select(
        "shard",
        "doc_id",
        "stream_start",
        "n_tok_doc",
        F.explode(F.sequence(first_pack, last_pack)).alias("local_pack"),
    )
    pack_start = F.col("local_pack") * seq_len  # stream offset where the pack begins
    seg_start = F.greatest(F.col("stream_start"), pack_start)
    seg_end = F.least(F.col("stream_start") + F.col("n_tok_doc"), pack_start + seq_len)
    return packs.select(
        (F.col("shard") * F.lit(1 << PACK_SHARD_BITS) + F.col("local_pack")).alias(
            "pack_id"
        ),
        "doc_id",
        (seg_start - F.col("stream_start")).cast("long").alias("doc_tok_start"),
        (seg_end - seg_start).cast("long").alias("n_tok"),
        (seg_start - pack_start).cast("long").alias("pack_tok_start"),
    )
