"""Unigram-LM (SentencePiece-style) tokenizer (operators/unigram)."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import Row

from pathik_spark.operators.unigram import (
    _forward_backward,
    seed_pieces,
    train_unigram,
    unigram_encode,
    unigram_model_from_counts,
    viterbi_encode,
)


def _brute_expected_counts(word, logp, max_len):
    """INDEPENDENT reference: enumerate every segmentation of the word
    explicitly, weight by its probability, average piece counts."""
    segs = []

    def rec(pos, acc):
        if pos == len(word):
            segs.append(list(acc))
            return
        for end in range(pos + 1, min(pos + max_len, len(word)) + 1):
            p = word[pos:end]
            if p in logp:
                acc.append(p)
                rec(end, acc)
                acc.pop()

    rec(0, [])
    if not segs:
        return {}, float("-inf")
    weights = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(weights)
    exp = {}
    for s, w in zip(segs, weights):
        for p in s:
            exp[p] = exp.get(p, 0.0) + w / z
    return exp, math.log(z)


def test_forward_backward_matches_brute_force():
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.15), "aba": math.log(0.1),
    }
    for word in ["ab", "aba", "abab", "ababa", "bb"]:
        got, ll = _forward_backward(word, logp, 3)
        want, ll_ref = _brute_expected_counts(word, logp, 3)
        if ll_ref == float("-inf"):
            assert ll == float("-inf")
            continue
        assert ll == pytest.approx(ll_ref, rel=1e-12)
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-10), (word, p)


def test_seed_includes_all_chars_and_top_substrings():
    counts = [("banana", 10), ("bandana", 5)]
    seed = seed_pieces(counts, n_seed=5, max_piece_len=4)
    assert {"b", "a", "n", "d"} <= set(seed)
    assert any(len(p) > 1 for p in seed)


def test_trainer_prunes_to_size_and_keeps_chars():
    counts = [("hello", 50), ("help", 30), ("yellow", 20), ("low", 40)]
    chars = set(itertools.chain.from_iterable(w for w, _ in counts))
    model = unigram_model_from_counts(counts, vocab_size=len(chars) + 4)
    assert chars <= set(model)
    assert len(model) <= len(chars) + 4
    # probabilities are a distribution-ish: all finite negatives
    assert all(lp < 0 for lp in model.values())
    # determinism: training twice gives the identical model
    again = unigram_model_from_counts(counts, vocab_size=len(chars) + 4)
    assert model == again


def test_viterbi_identity_and_fallback():
    model = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.5)}
    assert viterbi_encode("abab", model, 2) == ["ab", "ab"]
    # unseen char falls back to a singleton piece — still round-trips
    assert "".join(viterbi_encode("abxz", model, 2)) == "abxz"
    # ML beats greedy-longest when probabilities say so
    model2 = {
        "ab": math.log(0.05), "c": math.log(0.3),
        "a": math.log(0.3), "bc": math.log(0.3), "b": math.log(0.05),
    }
    assert viterbi_encode("abc", model2, 2) == ["a", "bc"]


def test_end_to_end_spark_training_and_encode(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the banana band ran and ran " * 3) for i in range(8)]
        + [Row(doc_id=100 + i, text="a banana brand new band " * 2) for i in range(4)],
        "doc_id long, text string",
    )
    model = train_unigram(docs, vocab_size=40)
    assert len(model) <= 40
    enc = unigram_encode(docs, model)
    rows = enc.collect()
    assert all(r["n_unigram_tokens"] == len(r["tokens"]) > 0 for r in rows)
    # round-trip: joining pieces reproduces the normalized words
    from pathik_spark.operators.dedup import normalized_text
    from pyspark.sql import functions as F

    norm = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", normalized_text(F.col("text")).alias("n")
        ).collect()
    }
    for r in rows:
        assert "".join(r["tokens"]) == norm[r["doc_id"]].replace(" ", "")
