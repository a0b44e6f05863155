"""Public-suffix-list (eTLD+1) derivation and site-granular politeness
grouping (operators/psl.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.psl import (
    PSL_SNAPSHOT,
    attach_registrable_domain,
    group_politeness_by_domain,
    registrable_domain,
)

# (host, public_suffix, registrable_domain) — publicsuffix.org spec cases
SPEC = [
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("a.b.shop.example.co.uk", "co.uk", "example.co.uk"),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),  # host IS a public suffix
    # wildcard family *.ck: every <label>.ck is a suffix...
    ("foo.ck", "foo.ck", None),
    ("bar.foo.ck", "foo.ck", "bar.foo.ck"),
    # ...except the !www.ck exception, a registrable domain itself
    ("www.ck", "ck", "www.ck"),
    ("sub.www.ck", "ck", "www.ck"),
    # normalization: case + one trailing dot
    ("EXAMPLE.Com.", "com", "example.com"),
    # implicit default rule '*' for unknown TLDs / single labels
    ("localhost", "localhost", None),
    ("intranet.corp", "corp", "intranet.corp"),
    # deep multi-label rules
    ("cdn.media.example.com.au", "com.au", "example.com.au"),
    ("k12.ca.us", "k12.ca.us", None),
    ("district.k12.ca.us", "k12.ca.us", "district.k12.ca.us"),
    ("www.district.k12.ca.us", "k12.ca.us", "district.k12.ca.us"),
]


@pytest.fixture(scope="module")
def resolved(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in SPEC], "host string")
    return {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in registrable_domain(df).collect()
    }


def test_psl_spec_cases(resolved):
    for host, sfx, reg in SPEC:
        key = host.lower().rstrip(".")
        assert resolved[key] == (sfx, reg), f"{host}: {resolved[key]} != {(sfx, reg)}"


def test_rules_broadcast_not_shuffled(spark):
    df = spark.createDataFrame([("www.example.co.uk",)], "host string")
    plan = registrable_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_attach_always_yields_usable_key(spark):
    df = spark.createDataFrame(
        [("u1", "a.example.co.uk"), ("u2", "co.uk"), ("u3", "b.example.co.uk")],
        "url string, host string",
    )
    got = {r["url"]: r["registrable_domain"] for r in attach_registrable_domain(df).collect()}
    # suffix-only host coalesces to itself: grouping key never NULL
    assert got == {"u1": "example.co.uk", "u2": "co.uk", "u3": "example.co.uk"}


def test_politeness_grouping_unifies_subdomains(spark):
    """The scheduler is keyed on `host`; after the rewrite, subdomains of
    one registered site share a single politeness identity while the
    original hostname survives as `hostname`."""
    frontier = spark.createDataFrame(
        [
            ("http://img1.shop.example.co.uk/a", "img1.shop.example.co.uk"),
            ("http://img2.shop.example.co.uk/b", "img2.shop.example.co.uk"),
            ("http://example.co.uk/c", "example.co.uk"),
            ("http://other.org/d", "other.org"),
        ],
        "url string, host string",
    )
    out = group_politeness_by_domain(frontier)
    rows = out.collect()
    by_url = {r["url"]: r for r in rows}
    assert {r["host"] for r in rows} == {"example.co.uk", "other.org"}
    assert by_url["http://img1.shop.example.co.uk/a"]["hostname"] == "img1.shop.example.co.uk"
    # 3 URLs of the same registered site share one scheduler key
    assert (
        sum(1 for r in rows if r["host"] == "example.co.uk") == 3
    )


def test_custom_rules_override_snapshot(spark):
    df = spark.createDataFrame([("a.b.mytld",)], "host string")
    default = registrable_domain(df).collect()[0]
    assert default["registrable_domain"] == "b.mytld"  # implicit '*'
    custom = registrable_domain(df, rules=list(PSL_SNAPSHOT) + ["b.mytld"]).collect()[0]
    assert custom["public_suffix"] == "b.mytld"
    assert custom["registrable_domain"] == "a.b.mytld"
