"""hreflang alternate extraction / mutual confirmation / clustering
(operators/multilingual.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.multilingual import (
    extract_hreflang_links,
    hreflang_alternates,
    hreflang_clusters,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


EN = "https://s.example/en/p"
FR = "https://s.example/fr/p"
DE = "https://s.example/de/p"


def test_extracts_both_attribute_orders_and_case(spark):
    rows = [
        (EN,
         '<link rel="alternate" hreflang="fr" href="https://s.example/fr/p">'
         '<LINK HREFLANG="DE" REL="ALTERNATE" HREF="https://s.example/de/p">'),
    ]
    got = {
        (r.lang, r.alt_url)
        for r in extract_hreflang_links(_pages(spark, rows)).collect()
    }
    assert got == {("fr", FR), ("de", DE)}


def test_drops_malformed_declarations(spark):
    rows = [
        (EN,
         # bad language tags
         '<link rel="alternate" hreflang="english" href="https://s.example/a">'
         '<link rel="alternate" hreflang="en_US" href="https://s.example/b">'
         # empty + non-http hrefs
         '<link rel="alternate" hreflang="es" href="">'
         '<link rel="alternate" hreflang="pt" href="mailto:x@y.example">'
         # no rel=alternate
         '<link hreflang="it" href="https://s.example/c">'),
    ]
    assert extract_hreflang_links(_pages(spark, rows)).count() == 0


def test_relative_href_resolves_against_page(spark):
    rows = [(EN, '<link rel="alternate" hreflang="fr" href="../fr/p">')]
    [r] = extract_hreflang_links(_pages(spark, rows)).collect()
    assert r.alt_url == FR


def test_duplicate_tags_collapse(spark):
    rows = [
        (EN,
         '<link rel="alternate" hreflang="FR" href="https://s.example/fr/p">'
         '<link rel="alternate" hreflang="fr" href="https://s.example/fr/p">'),
    ]
    assert extract_hreflang_links(_pages(spark, rows)).count() == 1


def test_mutual_flag_requires_backlink(spark):
    rows = [
        (EN, '<link rel="alternate" hreflang="fr" href="%s">' % FR),
        (FR, '<link rel="alternate" hreflang="en" href="%s">' % EN),
        (DE, '<link rel="alternate" hreflang="en" href="%s">' % EN),
    ]
    got = {
        (r.url, r.alt_url): r.mutual
        for r in hreflang_alternates(_pages(spark, rows)).collect()
    }
    assert got[(EN, FR)] == 1 and got[(FR, EN)] == 1
    assert got[(DE, EN)] == 0  # en never declares de back


def test_self_reference_is_mutual(spark):
    rows = [(EN, '<link rel="alternate" hreflang="en" href="%s">' % EN)]
    [r] = hreflang_alternates(_pages(spark, rows)).collect()
    assert (r.alt_url, r.mutual) == (EN, 1)


def test_mutual_across_different_labels(spark):
    # A declares B as "fr"; B declares A as "en-gb" — the PAIR is
    # mutual regardless of which language tags carried it.
    rows = [
        (EN, '<link rel="alternate" hreflang="fr" href="%s">' % FR),
        (FR, '<link rel="alternate" hreflang="en-gb" href="%s">' % EN),
    ]
    got = {r.url: r.mutual for r in hreflang_alternates(_pages(spark, rows)).collect()}
    assert got == {EN: 1, FR: 1}


def test_clusters_only_mutual_families(spark):
    rows = [
        # confirmed trio
        (EN, '<link rel="alternate" hreflang="fr" href="%s">'
             '<link rel="alternate" hreflang="de" href="%s">' % (FR, DE)),
        (FR, '<link rel="alternate" hreflang="en" href="%s">' % EN),
        (DE, '<link rel="alternate" hreflang="en" href="%s">' % EN),
        # one-way declaration: excluded
        ("https://lone.example/x",
         '<link rel="alternate" hreflang="fr" href="%s">' % FR),
    ]
    links = hreflang_alternates(_pages(spark, rows))
    got = {r.url: r.cluster_id for r in hreflang_clusters(links).collect()}
    assert got == {EN: DE, FR: DE, DE: DE}  # de is the lexicographic min
    assert "https://lone.example/x" not in got


def test_cluster_label_partitioning_independent(spark):
    rows = [
        (EN, '<link rel="alternate" hreflang="fr" href="%s">' % FR),
        (FR, '<link rel="alternate" hreflang="en" href="%s">' % EN),
    ]
    links = hreflang_alternates(_pages(spark, rows))
    a = sorted(map(tuple, hreflang_clusters(links.repartition(1)).collect()))
    b = sorted(map(tuple, hreflang_clusters(links.repartition(7)).collect()))
    assert a == b
