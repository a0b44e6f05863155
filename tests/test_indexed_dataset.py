"""Megatron/Fairseq indexed binary dataset sink (sources/indexed_dataset)."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest
from pyspark.sql import Row

from pathik_spark.sources.indexed_dataset import (
    MAGIC,
    read_indexed_dataset,
    token_dtype,
    write_indexed_token_shards,
)


def _docs(spark, n=40, vocab=50000):
    rows = [
        Row(doc_id=i, token_ids=[(i * 37 + j * 13) % vocab for j in range(3 + i % 9)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>")


def _read_all(out_dir, prefix="tokens"):
    got = {}
    for idx in sorted(glob.glob(f"{out_dir}/{prefix}-*.idx")):
        base = idx[: -len(".idx")]
        got[base] = read_indexed_dataset(base)
    return got


def test_roundtrip_uint16(spark, tmp_path):
    df = _docs(spark)
    summary = write_indexed_token_shards(
        df, str(tmp_path), n_shards=4, vocab_size=50000
    )
    assert sum(s["n_docs"] for s in summary) == 40
    seqs = [list(map(int, a)) for shard in _read_all(str(tmp_path)).values() for a in shard]
    want = sorted(r["token_ids"] for r in df.collect())
    assert sorted(seqs) == want
    # uint16 on disk: bin bytes = 2 * total tokens
    total_tokens = sum(s["n_tokens"] for s in summary)
    import os

    bin_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{tmp_path}/tokens-*.bin")
    )
    assert bin_bytes == 2 * total_tokens


def test_int32_when_vocab_large(spark, tmp_path):
    assert token_dtype(1 << 17) == np.dtype(np.int32)
    df = spark.createDataFrame(
        [Row(doc_id=1, token_ids=[70000, 2, 3])],
        "doc_id long, token_ids array<int>",
    )
    write_indexed_token_shards(
        df, str(tmp_path), n_shards=1, vocab_size=1 << 17
    )
    [seqs] = _read_all(str(tmp_path)).values()
    assert list(map(int, seqs[0])) == [70000, 2, 3]


def test_out_of_range_id_fails_loudly(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=1, token_ids=[70000])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="token id outside"):
        write_indexed_token_shards(
            df, str(tmp_path), n_shards=1, vocab_size=30000
        )


def test_shard_membership_deterministic(spark, tmp_path):
    df = _docs(spark, n=60)
    write_indexed_token_shards(df, str(tmp_path / "a"), n_shards=4, vocab_size=50000)
    write_indexed_token_shards(df, str(tmp_path / "b"), n_shards=4, vocab_size=50000)
    a = {k.split("/")[-1]: [list(map(int, s)) for s in v] for k, v in _read_all(str(tmp_path / "a")).items()}
    b = {k.split("/")[-1]: [list(map(int, s)) for s in v] for k, v in _read_all(str(tmp_path / "b")).items()}
    assert a == b  # same shards, same order, same bytes


def test_idx_header_fields(spark, tmp_path):
    df = _docs(spark, n=10)
    write_indexed_token_shards(df, str(tmp_path), n_shards=1, vocab_size=50000)
    [idx] = glob.glob(f"{tmp_path}/tokens-*.idx")
    raw = open(idx, "rb").read()
    assert raw[: len(MAGIC)] == MAGIC
    version, code, n, n_docs = struct.unpack_from("<QBQQ", raw, len(MAGIC))
    assert (version, code) == (1, 8)  # uint16
    assert n == 10 and n_docs == 11
    # sizes / pointers consistency
    off = len(MAGIC) + struct.calcsize("<QBQQ")
    sizes = np.frombuffer(raw, np.int32, n, off)
    pointers = np.frombuffer(raw, np.int64, n, off + 4 * n)
    assert pointers[0] == 0
    assert all(
        pointers[i] == pointers[i - 1] + 2 * sizes[i - 1] for i in range(1, n)
    )


def test_export_tokenized_corpus_end_to_end(spark, tmp_path):
    import json

    from pathik_spark.api import export_tokenized_corpus

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the band ran and ran to the banana stand") for i in range(12)],
        "doc_id long, text string",
    )
    for tok in ("bpe", "unigram"):
        out = str(tmp_path / tok)
        res = export_tokenized_corpus(
            docs, out, tokenizer=tok, vocab_size=64, n_merges=16, n_shards=2
        )
        assert res["tokenizer"] == tok
        vocab = json.load(open(res["vocab_path"]))
        assert vocab["<unk>"] == res["vocab_size"] - 1
        assert len(vocab) == res["vocab_size"]
        total_docs = sum(n for _, n, _ in res["shards"])
        assert total_docs == 12
        # read the shards back: ids are in-vocab, every doc non-empty
        inv = {i: p for p, i in vocab.items()}
        seqs = [
            s
            for base, n, _ in res["shards"]
            for s in read_indexed_dataset(base)
        ]
        assert len(seqs) == 12
        assert all(len(s) > 0 for s in seqs)
        assert all(int(t) in inv for s in seqs for t in s)
        # decode one sequence back to the normalized text (no spaces)
        joined = "".join(inv[int(t)] for t in seqs[0]).replace("</w>", "")
        assert "banana" in joined
