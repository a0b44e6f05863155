"""BPE tokenizer training/encoding (operators/bpe.py): distributed
word-count stage + driver merge loop, equality-tested against an
independent pure-Python reference (the sim-oracle pattern)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_merges_from_counts,
    bpe_vocab,
    encode_word,
    train_bpe,
    word_counts,
)

SENTS = [
    "the lower house lowered the lowest low rates",
    "new lower rates for the newest low cost plans",
    "she sells sea shells by the sea shore",
    "the shore stores store sea salt in low crates",
    "lowering rates lowers the cost of the plans",
] * 3


def _docs(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTS)], "doc_id long, text string"
    )


# -- independent reference implementation (Counter-based) ----------------


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip().split(" ") if w)
    return c


def _ref_bpe(texts, n_merges):
    wc = _ref_word_counts(texts)
    words = {tuple(w) + (EOW,): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for sym, n in words.items():
            for pair in zip(sym, sym[1:]):
                pc[pair] += n
        if not pc:
            break
        # max count, lexicographically smallest pair on ties
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        nxt = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        words = nxt
    return merges


def test_word_counts_match_reference(spark):
    got = {r["word"]: r["n"] for r in word_counts(_docs(spark)).collect()}
    assert got == dict(_ref_word_counts(SENTS))


def test_train_matches_reference_and_partitioning_independent(spark):
    docs = _docs(spark)
    ref = _ref_bpe(SENTS, 48)
    assert train_bpe(docs, n_merges=48) == ref
    assert train_bpe(docs.repartition(7), n_merges=48) == ref


def test_known_tiny_example():
    merges = bpe_merges_from_counts([("ab", 2), ("abc", 1)], 2)
    assert merges == [("a", "b"), ("ab", EOW)]


def test_encode_round_trip_and_monotone_compression(spark):
    docs = _docs(spark)
    m64 = train_bpe(docs, n_merges=64)
    enc = {r["doc_id"]: r for r in bpe_encode(docs, m64).collect()}
    for i, s in enumerate(SENTS):
        norm = re.sub(r"\s+", " ", s.lower(), flags=re.ASCII).strip()
        # concatenating tokens and splitting on the EOW marker restores
        # the exact word sequence — lossless subword segmentation
        joined = "".join(enc[i]["tokens"])
        assert joined == "".join(w + EOW for w in norm.split(" "))
        assert enc[i]["n_bpe_tokens"] == len(enc[i]["tokens"])
    # more merges never increase the token count of any doc
    n8 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(docs, m64[:8]).collect()}
    for i in enc:
        assert enc[i]["n_bpe_tokens"] <= n8[i]


def test_encode_word_replays_merges():
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    assert encode_word("low", merges) == ["low" + EOW]
    assert encode_word("lower", merges) == ["low", "e", "r", EOW]
    assert encode_word("", merges) == [EOW]


def test_empty_and_blank_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "one word")],
        "doc_id long, text string",
    )
    assert word_counts(docs).count() == 2  # 'one', 'word'
    enc = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(docs, []).collect()}
    assert enc[0] == 0 and enc[1] == 0 and enc[2] == 0 and enc[3] > 0


def test_vocab_order():
    v = bpe_vocab([("a", "b"), ("ab", EOW)], base="ab")
    assert v == ["a", "b", EOW, "ab", "ab" + EOW]


def test_max_words_cap_is_deterministic(spark):
    docs = _docs(spark)
    a = train_bpe(docs, n_merges=16, max_words=10)
    b = train_bpe(docs.repartition(5), n_merges=16, max_words=10)
    assert a == b
