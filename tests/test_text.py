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
