"""Text-analysis functions over documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.functions import text as TX

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], "text string"
    )
    got = [r["n"] for r in df.select(TX.token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here", "en"),
            ("der hund und die katze ist nicht da", "de"),
            ("le chat est dans la maison pour que", "fr"),
            ("これは日本語のテキストです", "ja"),
            ("zzz qqq xxx", "und"),
        ],
        "text string, expected string",
    )
    rows = df.select("expected", TX.lang_id(F.col("text")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], r


def test_quality_score_ranges(spark, docs):
    out = docs.select(TX.quality_score(F.col("text")).alias("q"))
    bad = out.filter((F.col("q") < 0) | (F.col("q") > 1)).count()
    assert bad == 0
    # longer, stopword-bearing english text scores higher than junk
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog and runs to the hills with great speed for many miles " * 5,),
            ("!!! ??? ### $$$ %%%",),
        ],
        "text string",
    )
    good, junk = [r[0] for r in df.select(TX.quality_score(F.col("text"))).collect()]
    assert good > junk


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different text",)], "text string"
    )
    fps = [r["f"] for r in df.select(TX.doc_fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]  # normalization collapses case/ws
    rf = [
        r["rf"]
        for r in df.select(TX.rolling_fingerprint(F.col("text"), 2).alias("rf")).collect()
    ]
    assert rf[0] == rf[1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world 123",)], "text string")
    n = df.select(TX.bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    # hell+o, comma, worl+d, 123 -> 2 + 1 + 2 + 1 = 6
    assert n == 6


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@sub.ex.co now",),
            ("ip 192.168.1.250 end",),
            ("call +1(415)555-0199 ok",),
            ("year 2024 and id 123 stay",),
            ("a@b.io 10.0.0.1 8005550123",),
            ("",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(TX.pii_scrub(F.col("text"))).collect()]
    assert got == [
        "mail <EMAIL> now",
        "ip <IP> end",
        "call <PHONE> ok",
        "year 2024 and id 123 stay",  # short digit runs untouched
        "<EMAIL> <IP> <PHONE>",
        "",
    ]


def test_repetition_signals_edges(spark):
    from pathik_spark.operators.quality import repetition_signals

    rows = [
        # 0: all-duplicate lines, all-duplicate tokens, one bigram
        (0, "spam ham\nspam ham\nspam ham"),
        # 1: all distinct -> everything passes
        (1, "the quick brown fox jumps over lazy dogs"),
        # 2: empty text -> zero signals, filtered by MIN_TOKENS
        (2, ""),
        # 3: single token -> no bigrams
        (3, "word"),
        # 4: dominant bigram: 'x y' 3 times out of 7 bigrams
        (4, "x y a x y b x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    assert got[0]["dup_line_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[0]["dup_token_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert got[0]["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert got[0]["keep"] is False
    assert got[1]["keep"] is True
    assert got[1]["dup_token_frac"] == 0.0
    assert got[2] == {
        "doc_id": 2, "n_tokens": 0, "dup_line_frac": 0.0, "dup_token_frac": 0.0,
        "top_bigram_frac": 0.0, "keep": False,
    }
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[4]["top_bigram_frac"] == pytest.approx(3 / 7, abs=1e-6)


def test_repetition_top_bigram_vs_pandas(spark):
    """Sorted-run formulation == hashmap count on pseudo-random docs."""
    import collections
    import random

    from pathik_spark.operators.quality import repetition_signals

    rng = random.Random(7)
    rows = []
    for i in range(50):
        toks = [rng.choice("abcdefg") for _ in range(rng.randrange(0, 40))]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["top_bigram_frac"] for r in repetition_signals(df).collect()}
    for i, text in rows:
        toks = text.split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want = round(max(collections.Counter(bgs).values()) / len(bgs), 6) if bgs else 0.0
        assert got[i] == pytest.approx(want, abs=1e-6), i


def test_pii_scrub_matches_python_re_on_ascii(spark):
    """The Spark (Java-regex) scrub chain == the same chain under Python
    re, over adversarial ASCII inputs (planted PII fragments glued with
    random separators). ASCII only: Java/RE2 \\b is ASCII-word-bounded
    while Python's is Unicode-aware — the engine pair's consistency on
    the full range is what the DuckDB oracle checks."""
    import random
    import re

    from pathik_spark.functions.text_constants import PII_PATTERNS

    rng = random.Random(11)
    frags = [
        "a@b.co", "x.y+z@mail.example.org", "@nolocal.com", "trail@dot.",
        "1.2.3.4", "999.999.999.999", "1.2.3.4.5", "v1.2.3",
        "+1234567", "123456", "(415)555-0199", "12-34-56-78", "+-()",
        "word", "42", ".", "@", "-", "a_b%c", "10.0.0.", "x1.2.3.4y",
    ]
    seps = ["", " ", "  ", ",", "\n", ":", "/", "<", ">"]
    texts = [
        "".join(
            rng.choice(frags) + rng.choice(seps)
            for _ in range(rng.randrange(1, 8))
        )
        for _ in range(300)
    ]

    def py_scrub(t: str) -> str:
        for pattern, repl in PII_PATTERNS:
            t = re.sub(pattern, repl, t)
        return t

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {r["i"]: r["s"] for r in df.select("i", TX.pii_scrub(F.col("text")).alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_scrub(t), (i, repr(t), repr(got[i]), repr(py_scrub(t)))


def test_clean_corpus_gates_compose(spark):
    """keep is exactly the conjunction of the four component gates."""
    from pathik_spark.operators.quality import clean_corpus
    from pathik_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    sh = D.word_shingles(docs, n=3)
    sig = D.minhash_signatures(sh, num_hashes=16, portable=True)
    cands = D.lsh_candidate_pairs(sig, num_hashes=16, band_size=2, portable=True)
    pairs = D.jaccard_pairs(sh, cands, threshold=0.4)
    out = clean_corpus(docs, pairs).cache()
    assert out.count() == docs.count()
    bad = out.filter(
        F.col("keep")
        != (
            (F.col("lang_guess") == "en")
            & (F.col("quality") >= 0.5)
            & F.col("rep_keep")
            & F.col("is_canonical")
        )
    )
    assert bad.count() == 0
    # a near-dup cluster never keeps two docs
    two = out.filter(F.col("keep")).groupBy("cluster_id").count().filter(
        F.col("count") > 1
    )
    assert two.count() == 0


def test_gopher_rules_per_rule_isolation(spark):
    """Each Gopher Table A1 gate trips on exactly its target document
    while the clean 80-word document passes all of them."""
    from pathik_spark.operators.quality import gopher_rules

    base = (
        "the quick brown fox jumps over and over the lazy dog "
        "with calm grace today again. " * 5
    )
    rows = [
        (0, "Too short document."),
        (1, "- item line for the listing and here\n" * 10),
        (2, "the story and plot continue without an end…\n" * 10),
        (3, base + "#### #### #### ####"),
        (4, "12345 " * 60 + "the of words"),
        (5, base),
        (6, ""),  # empty doc: 0 words, no crash, keep=false
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}

    assert not got[0]["keep"] and got[0]["n_words"] == 3
    assert not got[1]["keep"] and got[1]["bullet_line_frac"] == 1.0
    assert not got[2]["keep"] and got[2]["ellipsis_line_frac"] == 1.0
    assert got[2]["symbol_ratio"] == 0.0  # U+2026 is not a '...' run
    assert not got[3]["keep"] and got[3]["symbol_ratio"] > 0.1
    assert not got[4]["keep"] and got[4]["alpha_word_frac"] < 0.8
    assert got[5]["keep"]
    assert got[5]["n_words"] == 80 and got[5]["n_stop_distinct"] == 3
    assert not got[6]["keep"] and got[6]["n_words"] == 0


def test_gopher_rules_plan_is_scan_local(spark):
    """No shuffle, no Python: the verdict computes inside the scan."""
    from pathik_spark.operators.quality import gopher_rules

    docs = spark.createDataFrame([(1, "some text here.")], "doc_id long, text string")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_ngram_repetition_signals_exact_values(spark):
    """Hand-computed char-mass fractions and the scan-local plan."""
    from pathik_spark.operators.quality import ngram_repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # top-2 'a b' x3: 3*3/11
            (2, "one two three four five one two three four five"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = ngram_repetition_signals(docs)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["top_2gram_char_frac"] == round(9 / 11, 6)
    assert got[1]["dup_5gram_char_frac"] == 0.0
    # the 5-word phrase repeats once: one duplicate 5-gram instance of
    # 23 chars over 47 total
    assert got[2]["dup_5gram_char_frac"] == round(23 / 47, 6)
    assert got[3]["n_tokens"] == 0 and not got[3]["keep"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_sniff_content_type_magic_chain(spark):
    """Magic numbers win over markup; empty and null handled; real
    decoder outputs (kernels/media.py) sniff to their own labels."""
    from pyspark.sql import functions as F

    from pathik_spark.functions.sniff import sniff_content_type

    rows = [
        (0, bytearray(b"\x89PNG\r\n\x1a\nxx")),
        (1, bytearray(b"%PDF-1.4")),
        (2, bytearray(b"PK\x03\x04zipzip")),
        (3, bytearray(b"GIF89a\x01\x02")),
        (4, bytearray(b"RIFF\x00\x00\x00\x00WAVE")),
        (5, bytearray(b"\xff\xd8\xff\xe0jpeg")),
        (6, bytearray(b"\x1f\x8b\x08\x00gz")),
        (7, bytearray(b"<!doctype html>")),
        (8, bytearray(b"plain text payload")),
        (9, bytearray(b"")),
        (10, None),
        (11, bytearray(b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00")),
        (12, bytearray(b"abcdftyp")),  # 'ftyp' at byte 5 is the magic
    ]
    df = spark.createDataFrame(rows, "i long, b binary")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", sniff_content_type(F.col("b")).alias("t")).collect()
    }
    assert got == {
        0: "png", 1: "pdf", 2: "zip", 3: "gif", 4: "riff", 5: "jpeg",
        6: "gzip", 7: "markup", 8: "other", 9: "empty", 10: None,
        11: "mp4", 12: "mp4",
    }
    plan = (
        df.select(sniff_content_type(F.col("b")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_normalize_unicode_forms_and_controls(spark):
    """All four forms match CPython unicodedata; control stripping
    keeps tab/newline; NULL passes through; the plan is Arrow-batched
    (no row-at-a-time PythonUDF)."""
    import unicodedata

    from pyspark.sql import functions as F

    from pathik_spark.functions.unicode_norm import normalize_unicode

    dec = "resumé Å ȫ 가"
    ctrl = "line\x00one\x07\ttab\nnewline\x9fend"
    df = spark.createDataFrame([(0, dec), (1, ctrl), (2, None)], "i long, t string")
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        got = {
            r["i"]: r["o"]
            for r in df.select(
                "i", normalize_unicode(F.col("t"), form=form).alias("o")
            ).collect()
        }
        assert got[0] == unicodedata.normalize(form, dec)
        assert got[2] is None
    got = df.select(
        "i", normalize_unicode(F.col("t"), strip_controls=True).alias("o")
    ).collect()
    stripped = {r["i"]: r["o"] for r in got}[1]
    assert stripped == "lineone\ttab\nnewlineend"
    import pytest

    with pytest.raises(ValueError, match="form must be"):
        normalize_unicode(F.col("t"), form="NFX")
    plan = (
        df.select(normalize_unicode(F.col("t")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_soft404_signals_and_filter(spark):
    from pathik_spark.operators.quality import filter_soft404s, soft404_signals

    filler = "lorem " * 200  # ~1200 chars of padding
    rows = [
        (1, "Error 404 - Page Not Found. Sorry."),          # banner -> flagged
        (2, filler + " page not found"),                     # buried -> clean
        (3, "short page"),                                   # tiny but clean
        (4, "The page does not exist anymore, sorry." + filler),  # head marker
        (5, filler),                                         # clean long
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in soft404_signals(df).collect()}
    assert {d: out[d]["is_soft404"] for d in out} == {1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
    assert out[1]["tiny"] == 1 and out[5]["tiny"] == 0
    kept = {r["doc_id"] for r in filter_soft404s(df).collect()}
    assert kept == {2, 3, 5}
