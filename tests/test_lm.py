"""Tests for unigram LM quality scoring (operators/lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pathik_spark.operators.lm import lm_score, train_unigram_lm


def _ref(spark):
    # 'the' x6, 'cat' x3, 'sat' x3, 'mat' x2, 'dog' x1 -> vocab_size=4
    # keeps {the, cat, sat, mat}; 'dog' falls out
    return spark.createDataFrame(
        [
            (1, "the cat sat the mat"),
            (2, "the cat sat the mat"),
            (3, "the the cat sat dog"),
        ],
        "doc_id long, text string",
    )


def test_train_unigram_lm_vocab_and_probs(spark):
    lm = {r["tok"]: r for r in train_unigram_lm(_ref(spark), vocab_size=4).collect()}
    assert set(lm) == {"the", "cat", "sat", "mat"}
    # total kept mass = 6+3+3+2 = 14; denominator = 14 + 4 + 1 = 19
    assert all(r["total_mass"] == 19 for r in lm.values())
    assert lm["the"]["logp_micro"] == round(math.log10(7 / 19) * 1e6)
    assert lm["mat"]["logp_micro"] == round(math.log10(3 / 19) * 1e6)


def test_train_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame([(1, "b b a a c c")], "doc_id long, text string")
    lm = train_unigram_lm(docs, vocab_size=2).collect()
    assert sorted(r["tok"] for r in lm) == ["a", "b"]  # c loses the tie


def test_lm_score_ranks_gibberish_below_clean(spark):
    lm = train_unigram_lm(_ref(spark), vocab_size=4)
    docs = spark.createDataFrame(
        [
            (10, "the cat sat"),  # pure in-vocab
            (11, "zxqv wubble frag"),  # pure OOV
            (12, ""),  # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lm_score(docs, lm).collect()}
    assert got[10]["oov_rate"] == 0.0 and got[11]["oov_rate"] == 1.0
    assert got[10]["mean_logp"] > got[11]["mean_logp"]
    # OOV floor: log10(1/19)
    assert abs(got[11]["mean_logp"] - round(round(math.log10(1 / 19) * 1e6) / 1e6, 6)) < 1e-9
    assert (got[12]["n_tok"], got[12]["oov_rate"], got[12]["mean_logp"]) == (0, 1.0, 0.0)


def test_lm_score_partitioning_independent(spark):
    lm = train_unigram_lm(_ref(spark), vocab_size=4)
    docs = spark.createDataFrame(
        [(i, "the cat zxqv sat mat " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["mean_logp"] for r in lm_score(docs, lm).collect()}
    b = {r["doc_id"]: r["mean_logp"] for r in lm_score(docs.repartition(17), lm).collect()}
    assert a == b


def test_perplexity_buckets_exact_thirds(spark):
    from pathik_spark.operators.lm import perplexity_buckets

    rows = [
        # lang en: scores 9..1 -> head {0,1,2}, middle {3,4,5}, tail {6,7,8}
        *[(i, "en", float(9 - i)) for i in range(9)],
        # lang fr: 2 docs -> head gets 1, tail gets 1 under 3-way floor cut
        (100, "fr", 5.0),
        (101, "fr", 1.0),
    ]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, mean_logp double")
    out = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(scored, lang_col="lang").collect()}
    assert [out[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert out[100] == "head" and out[101] == "middle"


def test_perplexity_buckets_tiebreak_on_doc_id(spark):
    from pathik_spark.operators.lm import perplexity_buckets

    scored = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], "doc_id long, mean_logp double"
    )
    out = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(scored).collect()}
    assert [out[i] for i in range(6)] == ["head", "head", "middle", "middle", "tail", "tail"]


def test_perplexity_cutoffs_and_bucket_by_cutoffs(spark):
    from pathik_spark.operators.lm import bucket_by_cutoffs, perplexity_cutoffs

    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(30)],
        "doc_id long, lang string, mean_logp double",
    )
    cut = perplexity_cutoffs(scored, lang_col="lang", accuracy=100000)
    arr = cut.collect()[0]["cutoffs"]
    assert len(arr) == 2 and arr[0] > arr[1]
    out = bucket_by_cutoffs(scored, cut, lang_col="lang")
    pops = {r["ppl_bucket"]: r["n"] for r in out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(pops) == {"head", "middle", "tail"}
    # approx-quantile cut: populations within one element of exact thirds
    assert all(abs(pops[b] - 10) <= 1 for b in pops)
    # the corpus side stays scan-local: broadcast join, no corpus Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---- interpolated bigram LM --------------------------------------------------


def test_token_pairs_shape(spark):
    from pathik_spark.operators.lm import _token_pairs

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "x"), (2, "")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["w1"], r["w2"]) for r in _token_pairs(docs).collect()}
    assert rows == {(0, None, "a"), (0, "a", "b"), (0, "b", "c"), (1, None, "x")}


def test_train_bigram_lm_hand_probabilities(spark):
    import math

    from pathik_spark.operators.lm import train_bigram_lm

    # corpus: "a b a b a" -> unigram counts a=3 b=2; pairs: ab, ba, ab, ba
    docs = spark.createDataFrame([(0, "a b a b a")], "doc_id long, text string")
    lam = 0.8
    model = {
        (r["w1"], r["w2"]): r["logp_micro"]
        for r in train_bigram_lm(docs, vocab_size=16, lam=lam).collect()
    }
    m = 3 + 2 + 2 + 1  # sum(n) + vocab + 1
    exp_ab = round(math.log10(lam * (2 / 2) + (1 - lam) * ((2 + 1) / m)) * 1e6)
    exp_ba = round(math.log10(lam * (2 / 2) + (1 - lam) * ((3 + 1) / m)) * 1e6)
    assert model == {("a", "b"): exp_ab, ("b", "a"): exp_ba}


def test_bigram_lm_score_prefers_seen_order(spark):
    from pathik_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
        train_unigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)],
        "doc_id long, text string",
    )
    uni = train_unigram_lm(ref, vocab_size=16)
    bi = train_bigram_lm(ref, vocab_size=16, lam=0.8)
    probe = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on sat cat the"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(probe, bi, uni, lam=0.8).collect()}
    assert got[0]["mean_logp"] > got[1]["mean_logp"]  # order matters now
    assert got[0]["n_tok"] == got[1]["n_tok"] == 6
    assert got[2] and got[2]["n_tok"] == 0 and got[2]["mean_logp"] == 0.0


def test_bigram_lm_score_partitioning_independent(spark):
    from pathik_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
        train_unigram_lm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    uni = train_unigram_lm(docs, vocab_size=16)
    bi = train_bigram_lm(docs, vocab_size=16)
    one = sorted(map(tuple, bigram_lm_score(docs.coalesce(1), bi, uni).collect()))
    many = sorted(map(tuple, bigram_lm_score(docs.repartition(13), bi, uni).collect()))
    assert one == many


def test_bigram_lm_score_plan_broadcasts_models(spark):
    from pathik_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
        train_unigram_lm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    uni = train_unigram_lm(docs, vocab_size=16)
    bi = train_bigram_lm(docs, vocab_size=16)
    plan = (
        bigram_lm_score(docs, bi, uni)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both model joins broadcast; no cartesian; python stays out of scoring
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
