"""End-to-end test for the one-call cleaning pipeline facade
(pathik_spark.prepare_training_corpus)."""

from __future__ import annotations

import pathik_spark

BOILER = "Subscribe to the newsletter and follow us for more updates."

_ADJ = "quick bright ancient quiet heavy golden narrow broken silver distant".split()
_NOUN = "fox river mountain library engine harbor garden window market forest bridge tower".split()
_VERB = "cross follow repair study watch ignore measure paint visit record".split()
_TPL = [
    "The {n1} near the {n2} will {v} when the {a} light arrives.",
    "Some of the {n1} workers had taken their {n2} to the {a} fair.",
    "It was the {a} {n1} that would {v} most of the {n2} in town.",
    "They said the {n1} would not {v} until the {n2} was ready.",
    "After the {a} rain, every {n1} along the {n2} looked new to them.",
    "Nobody in the {n1} believed that the {a} {n2} could {v} again.",
]


def _line(i: int, j: int) -> str:
    return _TPL[j % 6].format(
        a=_ADJ[(i * 3 + j) % len(_ADJ)],
        n1=_NOUN[(i * 5 + j * 2) % len(_NOUN)],
        v=_VERB[(i * 7 + j * 3) % len(_VERB)],
        n2=_NOUN[(i * 2 + j * 5 + 3) % len(_NOUN)],
    )


def _docs(spark):
    rows = []
    for i in range(24):
        lines = [BOILER] + [_line(i, j) for j in range(6)]
        rows.append((i, "\n".join(lines)))
    # near-dup of doc 3 (identical body, different id)
    rows.append((100, "\n".join([BOILER] + [_line(3, j) for j in range(6)])))
    # doc gated out by the C4 lorem-ipsum rule
    rows.append((101, "Some lorem ipsum filler appears here today.\n" + _line(1, 1)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_training_corpus(spark):
    corpus, report = pathik_spark.prepare_training_corpus(
        _docs(spark), line_max_occurrences=5, min_quality=0.2
    )
    rows = {r["doc_id"]: r for r in corpus.collect()}
    # all 24 clean docs survive; the dup copy and the lorem doc are gone
    assert len(rows) == 24
    # corpus-wide boilerplate line removed from every surviving doc
    assert all(BOILER not in r["text"] for r in rows.values())
    # the lorem-ipsum doc is gone
    assert 101 not in rows
    # near-dup pair (3, 100): only the canonical (lowest id) survives
    assert 3 in rows and 100 not in rows
    # split labels are assigned and valid
    assert {r["split"] for r in rows.values()} <= {"train", "val", "test"}
    assert all(r["lang_guess"] == "en" for r in rows.values())
    # the report groups by (lang_guess, split) and counts every kept doc
    rep = report.collect()
    assert sum(r["n_docs"] for r in rep) == len(rows)
    assert all(r["lang_guess"] == "en" for r in rep)


def test_prepare_training_corpus_substring_stage(spark):
    """substring_ngram enables the ExactSubstr stage: a verbatim
    multi-line license block shared across docs disappears even though
    no single LINE repeats enough for the line-dedup gate, while unique
    sentences survive."""
    license_block = (
        "this work is licensed under the creative commons attribution "
        "share alike four point zero international license terms"
    )
    def uniq_sent(i: int) -> str:
        # every 8-gram window of this sentence includes an i-specific
        # token, so no window can repeat across docs
        return (
            f"document {i} keeps marker {i} inside its own distinctive "
            f"passage {i} about topic {i} forever"
        )

    rows = []
    for i in range(24):
        body = " ".join([_line(i, j) for j in range(6)] + [uniq_sent(i)])
        # the block repeats in only 6 docs -> each of its LINES occurs 6x
        # (below line_max_occurrences) but its 8-grams occur >= 2x
        text = body + (" " + license_block if i % 4 == 0 else "")
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs,
        line_max_occurrences=1000,
        min_quality=0.2,
        apply_c4=False,
        substring_ngram=8,
    )
    got = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert got, "corpus not empty"
    assert all("creative commons" not in t for t in got.values())
    # each doc's unique passage core survives (the final token bordering
    # the license block can erode away: the 8-gram "forever this work
    # is ..." contains no doc-specific token and repeats across the
    # license docs — correct ExactSubstr boundary behavior)
    for i, t in got.items():
        assert f"document {i} keeps marker {i}" in t, (i, t)
        assert f"passage {i} about topic {i}" in t, (i, t)


def test_prepare_training_corpus_lm_gate(spark):
    docs = _docs(spark)
    # add one gibberish doc that passes C4 shape rules but not the LM
    # same sentence scaffolds as the clean docs (passes every shape/lang
    # gate) but all content words are out-of-vocabulary gibberish — only
    # the LM can tell it apart
    gib = "zxqv wubble frag klort blivet snarf gronk plim vorp trell".split()
    extra = spark.createDataFrame(
        [
            (
                102,
                "\n".join(
                    _TPL[j].format(
                        a=gib[j], n1=gib[(j + 3) % 10], v=gib[(j + 5) % 10], n2=gib[(j + 7) % 10]
                    )
                    for j in range(6)
                ),
            )
        ],
        "doc_id long, text string",
    )
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs.union(extra),
        line_max_occurrences=5,
        min_quality=0.2,
        lm_reference=docs,
        min_mean_logp=-1.9,  # clean docs cluster ~-1.72; gibberish ~-2.08
    )
    rows = {r["doc_id"]: r for r in corpus.collect()}
    assert "mean_logp" in next(iter(rows.values())).asDict()
    assert 102 not in rows  # OOV-heavy doc scored below the gate
    assert 0 in rows and rows[0]["mean_logp"] > -1.9
    assert len(rows) == 24  # only the gibberish doc was LM-gated


def test_prepare_training_corpus_host_filter(spark):
    # farm host: garbage docs drag its mean quality to the floor; the
    # whole domain drops, including its one decent page
    rows = []
    for i in range(12):
        rows.append((i, "\n".join(_line(i, j) for j in range(6)), "good.example"))
    for i in range(100, 106):
        rows.append((i, "!!!! ???? @@@@ #### $$$$ %%%%", "farm.example"))
    rows.append((106, "\n".join(_line(2, j) for j in range(6)), "farm.example"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, host string")
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs,
        line_max_occurrences=50,
        min_quality=0.2,
        host_col="host",
        min_host_quality=0.5,
    )
    got = {r["doc_id"]: r for r in corpus.collect()}
    assert set(got) == set(range(12))
    assert all(r["host"] == "good.example" for r in got.values())


def test_prepare_training_corpus_ppl_bucket_drop(spark):
    docs = _docs(spark)
    corpus_all, _ = pathik_spark.prepare_training_corpus(
        docs, line_max_occurrences=5, min_quality=0.2, lm_reference=docs
    )
    corpus_cut, _ = pathik_spark.prepare_training_corpus(
        docs,
        line_max_occurrences=5,
        min_quality=0.2,
        lm_reference=docs,
        drop_ppl_buckets=("tail",),
    )
    n_all = corpus_all.count()
    n_cut = corpus_cut.count()
    # the tail third is gone, head+middle survive (rank-exact thirds)
    assert n_cut == n_all - n_all // 3
    assert corpus_cut.filter(corpus_cut.ppl_bucket == "tail").count() == 0


def test_prepare_training_corpus_dsir_selection(spark):
    docs = _docs(spark)
    target = docs.filter(docs.doc_id < 6)
    corpus, report = pathik_spark.prepare_training_corpus(
        docs,
        line_max_occurrences=5,
        min_quality=0.2,
        dsir_target=target,
        dsir_k=10,
    )
    assert corpus.count() == 10
    assert sum(r["n_docs"] for r in report.collect()) == 10


def test_drop_ppl_buckets_requires_lm_reference(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pathik_spark.prepare_training_corpus(
            _docs(spark), drop_ppl_buckets=("tail",)
        )


def test_prepare_training_corpus_lang_mix(spark):
    docs = _docs(spark)
    full, _ = pathik_spark.prepare_training_corpus(
        docs, line_max_occurrences=5, min_quality=0.2
    )
    mixed, _ = pathik_spark.prepare_training_corpus(
        docs, line_max_occurrences=5, min_quality=0.2, lang_mix_alpha=0.0
    )
    n_full, n_mixed = full.count(), mixed.count()
    assert 0 < n_mixed <= n_full
    # alpha=1 keeps the raw (post-gate) distribution untouched
    raw, _ = pathik_spark.prepare_training_corpus(
        docs, line_max_occurrences=5, min_quality=0.2, lang_mix_alpha=1.0
    )
    assert raw.count() == n_full


def test_prepare_training_corpus_soft404_gate(spark):
    docs = _docs(spark)
    err = spark.createDataFrame(
        [(102, "Error 404 - Page Not Found.\n" + _line(2, 2))],
        "doc_id long, text string",
    )
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs.union(err), line_max_occurrences=5, min_quality=0.2
    )
    kept = {r["doc_id"] for r in corpus.collect()}
    assert 102 not in kept          # soft-404 dropped before the gates
    assert 3 in kept                # clean docs unaffected
    corpus2, _ = pathik_spark.prepare_training_corpus(
        docs.union(err), line_max_occurrences=5, min_quality=0.2,
        drop_soft404=False,
    )
    # with the gate off the page reaches the normal quality gates
    assert corpus2.count() >= corpus.count()


def test_prepare_training_corpus_plan_shape(spark):
    """Composed-pipeline scale shape: the ONLY Spark jobs run during
    plan construction are the connected-components convergence loop's
    (dedup_clusters is inherently iterative — localCheckpoint per
    round, a single 2-field checksum row collected per round, O(log^2
    n) rounds); every other stage stays a lazy plan. And the composed
    physical plan contains no cartesian product — every join is keyed
    (LSH band buckets, doc_id join-backs, broadcast gates)."""
    from pathik_spark.operators.dedup import dedup_clusters

    docs = _docs(spark)
    pairs = spark.createDataFrame(
        [(3, 100), (7, 8)], "doc_a long, doc_b long"
    )
    sc = spark.sparkContext
    # calibrate: the CC loop alone on the same edges (AQE splits each
    # round's localCheckpoint + checksum collect into several jobs, so
    # the count is environment-dependent — measure it, don't guess it)
    sc.setJobGroup("cc_cal", "CC loop alone")
    try:
        dedup_clusters(docs, pairs, id_col="doc_id")
        cc_alone = len(list(sc.statusTracker().getJobIdsForGroup("cc_cal")))
    finally:
        sc.setJobGroup("", "")
    sc.setJobGroup("ptc_plan", "bounded construction jobs")
    try:
        corpus, report = pathik_spark.prepare_training_corpus(
            docs, pairs=pairs, line_max_occurrences=5, min_quality=0.2
        )
        ptc_jobs = len(list(sc.statusTracker().getJobIdsForGroup("ptc_plan")))
        # the facade may only add the CC loop's own jobs (within one
        # extra convergence round of slack — the facade clusters the
        # CLEANED text): any other stage starting to collect trips this
        assert ptc_jobs <= 2 * cc_alone, (ptc_jobs, cc_alone)
    finally:
        sc.setJobGroup("", "")
    for df in (corpus, report):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_prepare_training_corpus_paragraph_dedup_stage(spark):
    # two docs sharing a paragraph: the later doc loses its copy but
    # keeps its unique paragraph; pipeline output reflects the strip
    shared = "Shared cross-posted paragraph about the golden harbor."
    rows = [
        (0, _line(0, 0) + "\n\n" + shared),
        (1, shared + "\n\n" + _line(1, 1)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs,
        apply_c4=False,
        min_quality=0.0,
        line_max_occurrences=100,
        dedup_paragraphs=True,
    )
    got = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert shared in got[0]
    assert shared not in got[1] and _line(1, 1) in got[1]


def test_lexicon_gate_stage(spark):
    docs = _docs(spark)
    spam = spark.createDataFrame(
        [(200, "casino jackpot betting casino jackpot " + _line(0, 0))],
        "doc_id long, text string",
    )
    corpus, _ = pathik_spark.prepare_training_corpus(
        docs.union(spam),
        line_max_occurrences=5,
        min_quality=0.2,
        lexicon_gate=True,
    )
    ids = {r["doc_id"] for r in corpus.collect()}
    assert 200 not in ids          # saturated spam dropped at stage 0a
    assert len(ids & set(range(24))) == 24  # clean docs unaffected
