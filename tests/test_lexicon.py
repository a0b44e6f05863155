"""Lexicon content gate (operators/lexicon.py)."""

from __future__ import annotations

from pathik_spark.operators.lexicon import (
    MICRO,
    filter_by_lexicon,
    lexicon_score,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def _rows(spark, texts, **kw):
    return {r.doc_id: r for r in lexicon_score(_docs(spark, texts), **kw).collect()}


def test_clean_text_passes(spark):
    [r] = _rows(spark, ["a long enough page about gardening and plants"]).values()
    assert (r.n_hits, r.flagged) == (0, 0)


def test_saturated_spam_flagged(spark):
    [r] = _rows(spark, ["casino jackpot betting casino jackpot win now"]).values()
    assert r.n_hits == 5 and r.flagged == 1


def test_incidental_hit_below_gate_passes(spark):
    text = "filler " * 59 + "casino"  # 1/60 = 16666 micro < 20000
    [r] = _rows(spark, [text]).values()
    assert (r.n_hits, r.hit_ratio_micro, r.flagged) == (1, 16666, 0)


def test_short_doc_with_hit_flagged(spark):
    [r] = _rows(spark, ["visit our casino"]).values()
    assert r.flagged == 1  # < 5 tokens, ratio meaningless


def test_word_boundary_excludes_plurals(spark):
    [r] = _rows(spark, ["casinos jackpots viagras escorts are plural"]).values()
    assert r.n_hits == 0


def test_multiword_term_across_whitespace_run(spark):
    [r] = _rows(spark, ["apply for a payday   loan today okay then"]).values()
    assert r.n_hits == 1


def test_case_folded(spark):
    [r] = _rows(spark, ["CASINO Jackpot neutral words here padding x"]).values()
    assert r.n_hits == 2


def test_empty_text(spark):
    [r] = _rows(spark, [""]).values()
    assert (r.n_tokens, r.n_hits, r.hit_ratio_micro, r.flagged) == (0, 0, 0, 0)


def test_custom_lexicon_and_threshold(spark):
    rows = _rows(
        spark,
        ["the word gadget appears once in these ten total words"],
        terms=("gadget",),
        max_ratio_micro=50_000,
    )
    [r] = rows.values()
    assert r.n_hits == 1 and r.hit_ratio_micro == MICRO // 10
    assert r.flagged == 1  # 10% > 5% custom gate


def test_filter_matches_score(spark):
    texts = [
        "a long enough page about gardening and plants",
        "casino jackpot betting casino jackpot win now",
        "visit our casino",
    ]
    docs = _docs(spark, texts)
    kept = {r.doc_id for r in filter_by_lexicon(docs).collect()}
    scored = {r.doc_id for r in lexicon_score(docs).collect() if r.flagged == 0}
    assert kept == scored == {0}
