"""X5/X6 byte-identity: the Spark Arrow UDF output must equal the golden
``text`` column (produced by the normative kernel at fixture time) for
every page, including the malformed / non-utf8 / empty strata
(SURVEY.md §5.2.2, input_hint per-row invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.functions.extract_udfs import (
    extract_text_udf,
    make_extract_text_udf,
    to_markdown_udf,
)
from pathik_spark.kernels import extract as X


def test_extract_text_byte_identical(spark, corpus):
    pages = corpus["pages"]
    mismatches = (
        pages.withColumn("got", extract_text_udf(F.col("html")))
        .filter(F.col("got") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_markdown_udf_matches_kernel(spark, corpus_pd):
    pd_pages = corpus_pd["pages"].iloc[:100]
    df = (
        spark.createDataFrame(
            pd_pages[["url", "html"]], schema="url string, html binary"
        )
        .withColumn("md", to_markdown_udf(F.col("html")))
    )
    got = {r["url"]: r["md"] for r in df.collect()}
    for _, row in pd_pages.iterrows():
        assert got[row["url"]] == X.to_markdown(row["html"]), row["url"]


def test_fetch_cap_truncation_applied_before_extraction(spark, corpus_pd):
    big = corpus_pd["pages"][corpus_pd["pages"].index % 100 == 18].iloc[:3]
    assert (big["html"].map(len) > 8192).all()
    cap = 8192
    df = spark.createDataFrame(big[["url", "html"]], schema="url string, html binary")
    udf = make_extract_text_udf(cap)
    got = {r["url"]: r["t"] for r in df.withColumn("t", udf(F.col("html"))).collect()}
    for _, row in big.iterrows():
        assert got[row["url"]] == X.extract_text(row["html"], cap)
        assert got[row["url"]] != X.extract_text(row["html"])  # cap actually bit


def test_edge_strata_deterministic(corpus_pd):
    pages = corpus_pd["pages"]
    empty = pages[pages.index % 100 == 15].iloc[0]
    assert empty["text"] == ""
    malformed = pages[pages.index % 100 == 16].iloc[0]
    assert X.extract_text(malformed["html"]) == malformed["text"]
    nonutf8 = pages[pages.index % 100 == 17].iloc[0]
    assert "caf�" in nonutf8["text"]  # replacement char, deterministic
    assert X.extract_text(nonutf8["html"]) == nonutf8["text"]


def test_boilerplate_excluded(corpus_pd):
    texts = corpus_pd["pages"]["text"]
    assert not texts.str.contains("site header boilerplate").any()
    assert not texts.str.contains("copyright boilerplate").any()


def test_save_cap_truncation():
    content = "é" * 100
    out = X.truncate_for_save(content, 11)
    assert len(out.encode("utf-8")) <= 11
    assert out == "é" * 5  # 10 bytes; the split 11th byte dropped deterministically
