"""Crawl-trap detection over frontier URLs.

Real crawls die in traps: calendar pages that link to infinitely many
dates, session-id mazes, faceted-search query explosions, and path
cycles (``/a/b/a/b/a/b/...``). A 10^10-URL frontier must shed these
BEFORE scheduling — every trapped URL fetched is politeness budget
burned on a host that had real pages to give.

``trap_signals`` computes per-URL signals with pure column expressions
(split / filter / aggregate over the path segments — no UDF, no
shuffle): the verdict evaluates inside whatever scan/exchange already
carries the frontier, so at scale trap filtering is free.

Signals (thresholds tuned to common crawler defaults, cf. Heritrix's
PathologicalPathFilter and browsertrix's URL depth limits):
  - depth: number of non-empty path segments (> max_depth -> trap);
  - max_seg_repeat: max multiplicity of any path segment — a segment
    repeating >= 3 times is the classic path cycle;
  - n_params: query parameters (> max_params -> faceted explosion);
  - long_digit_run: an 8+ digit run in the path (timestamps/session
    ids; calendar traps live here);
  - url_len: total length (> max_len -> trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 12
MAX_SEG_REPEAT = 2
MAX_PARAMS = 8
MAX_URL_LEN = 512
DIGIT_RUN_RE = r"[0-9]{8,}"


def _max_multiplicity(sorted_arr):
    """Max multiplicity of any element of a SORTED array: one aggregate
    pass with a (prev, cur, best) accumulator (same shape as
    operators/quality._max_run)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        cur = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["cur"] + 1
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), cur.alias("cur"), F.greatest(acc["best"], cur).alias("best")
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def trap_signals(
    frontier: DataFrame,
    url_col: str = "url",
    max_depth: int = MAX_DEPTH,
    max_seg_repeat: int = MAX_SEG_REPEAT,
    max_params: int = MAX_PARAMS,
    max_url_len: int = MAX_URL_LEN,
) -> DataFrame:
    """Append (depth, max_seg_repeat, n_params, long_digit_run,
    url_len, is_trap, keep) to the frontier. keep = NOT is_trap."""
    url = F.col(url_col)
    # path: after the authority, before ? or # (empty when none)
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)

    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    seg_rep = F.when(depth > 0, _max_multiplicity(F.sort_array(segs))).otherwise(0)
    n_params = F.when(
        F.length(query) > 0, F.size(F.split(query, "&"))
    ).otherwise(0)
    digit_run = path.rlike(DIGIT_RUN_RE)
    url_len = F.length(url)

    out = frontier.select(
        "*",
        depth.alias("depth"),
        seg_rep.alias("max_seg_repeat"),
        n_params.alias("n_params"),
        digit_run.alias("long_digit_run"),
        url_len.alias("url_len"),
    )
    is_trap = (
        (F.col("depth") > max_depth)
        | (F.col("max_seg_repeat") > max_seg_repeat)
        | (F.col("n_params") > max_params)
        | F.col("long_digit_run")
        | (F.col("url_len") > max_url_len)
    )
    return out.select("*", is_trap.alias("is_trap"), (~is_trap).alias("keep"))


def filter_traps(frontier: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """The frontier with trapped URLs removed (original columns only)."""
    return (
        trap_signals(frontier, url_col=url_col, **thresholds)
        .filter("keep")
        .select(*frontier.columns)
    )
