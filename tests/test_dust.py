"""DUST parameter mining and frontier stripping (operators/dust.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.operators.dust import (
    dust_params,
    strip_dust_params,
    url_param_evidence,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, content_hash string")


H = "s.example"


def _u(q):
    return f"https://{H}/p?{q}"


def test_session_param_ruled_dust(spark):
    rows = [
        (H, f"https://{H}/a?sid=1", "ca"), (H, f"https://{H}/a?sid=2", "ca"),
        (H, f"https://{H}/b?sid=1", "cb"), (H, f"https://{H}/b?sid=2", "cb"),
    ]
    [r] = dust_params(_pages(spark, rows)).collect()
    assert (r.param, r.groups_tested, r.groups_collapsed, r.is_dust) == ("sid", 2, 2, 1)


def test_content_selecting_param_not_dust(spark):
    rows = [
        (H, f"https://{H}/a?page=1", "c1"), (H, f"https://{H}/a?page=2", "c2"),
        (H, f"https://{H}/b?page=1", "c3"), (H, f"https://{H}/b?page=2", "c4"),
    ]
    [r] = dust_params(_pages(spark, rows)).collect()
    assert (r.param, r.is_dust) == ("page", 0)


def test_single_counterexample_vetoes(spark):
    rows = [
        (H, f"https://{H}/a?sort=0", "same"), (H, f"https://{H}/a?sort=1", "same"),
        (H, f"https://{H}/b?sort=0", "x"), (H, f"https://{H}/b?sort=1", "y"),
    ]
    [r] = dust_params(_pages(spark, rows)).collect()
    assert (r.groups_tested, r.groups_collapsed, r.is_dust) == (2, 1, 0)


def test_min_groups_floor(spark):
    rows = [(H, f"https://{H}/a?ref=1", "c"), (H, f"https://{H}/a?ref=2", "c")]
    [r] = dust_params(_pages(spark, rows)).collect()
    assert (r.groups_tested, r.is_dust) == (1, 0)
    [r] = dust_params(_pages(spark, rows), min_groups=1).collect()
    assert r.is_dust == 1


def test_residual_key_order_insensitive(spark):
    # the same logical URL in two query orders must land in ONE group
    ev = url_param_evidence(
        _pages(spark, [(H, _u("a=1&b=2"), "c"), (H, _u("b=2&a=1"), "c")])
    )
    got = {(r.param, r.residual_key): r.n_urls for r in ev.collect()}
    assert got == {
        ("a", f"https://{H}/p?b=2"): 2,
        ("b", f"https://{H}/p?a=1"): 2,
    }


def test_queryless_urls_ignored(spark):
    rows = [(H, f"https://{H}/plain", "c"), (H, f"https://{H}/plain2", "d")]
    assert dust_params(_pages(spark, rows)).count() == 0


def test_strip_dust_params_rewrites_frontier(spark):
    mined = spark.createDataFrame(
        [(H, "sid", 2, 2, 1), (H, "page", 2, 0, 0)],
        "host string, param string, groups_tested bigint, "
        "groups_collapsed bigint, is_dust int",
    )
    frontier = _pages(
        spark,
        [
            (H, _u("sid=9&page=3"), "x"),
            (H, _u("sid=9"), "x"),
            (H, f"https://{H}/p", "x"),
            ("other.example", "https://other.example/p?sid=1", "x"),
        ],
    ).drop("content_hash")
    got = {r.url for r in strip_dust_params(frontier, mined).collect()}
    assert got == {
        _u("page=3"),            # dust stripped, selector kept
        f"https://{H}/p",        # all params dust -> bare base (x2 collapses)
        "https://other.example/p?sid=1",  # other host untouched
    }


def test_strip_keeps_param_order(spark):
    mined = spark.createDataFrame(
        [(H, "sid", 2, 2, 1)],
        "host string, param string, groups_tested bigint, "
        "groups_collapsed bigint, is_dust int",
    )
    frontier = spark.createDataFrame(
        [(H, _u("z=1&sid=4&a=2"))], "host string, url string"
    )
    [r] = strip_dust_params(frontier, mined).collect()
    assert r.url == _u("z=1&a=2")
