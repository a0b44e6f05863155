"""Lexicon content gate — the C4 "bad words" filter family.

C4 dropped any page containing a term from a public blocklist;
FineWeb and RefinedWeb soften that to a *ratio* gate because an
absolute ban deletes medical, legal, and news text. This operator is
the ratio form: count lexicon hits with word-boundary, case-folded
matching, normalize by the whitespace token count (the shared
``token_count`` convention), and flag pages whose hit ratio crosses
the threshold. It complements the existing quality family — Gopher
gates catch structural garbage, the LR classifier catches low-quality
prose, this catches *on-topic-but-unwanted* content categories that
are perfectly well-formed text.

The default lexicon is a small spam/adult-industry marker list
(gambling/pharma/adult-services terms — the categories every public
web blocklist leads with); production use passes the full list of
choice via ``terms``. URL-side category blocking is the sibling
``operators/blocklist.py``; this is the content side.

Scale: one ``regexp_count`` per term inside the page scan — pure
codegen'd expressions, no UDF, no shuffle, no join. A thousand-term
lexicon compiles to one alternation regex instead (``combine=True``)
so the scan stays single-pass.

Reference parity: justrach/pathik has no content filtering (SURVEY
training-data family; sibling of quality.gopher_rules and
blocklist.url_blocklist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.text import token_count

MICRO = 1_000_000

# category markers, not slurs: the public-blocklist lead categories
DEFAULT_LEXICON = (
    "casino", "jackpot", "betting", "payday loan", "viagra", "cialis",
    "porn", "xxx", "escort", "crypto giveaway",
)


def _term_pattern(term: str) -> str:
    """Word-boundary pattern for a (possibly multi-word) lowercase
    term; spaces match any whitespace run."""
    import re

    return r"\b" + re.escape(term.lower()).replace(r"\ ", r"\s+") + r"\b"


def lexicon_score(
    docs: DataFrame,
    terms: tuple[str, ...] = DEFAULT_LEXICON,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio_micro: int = 20_000,
    combine: bool = True,
) -> DataFrame:
    """(id, n_tokens, n_hits, hit_ratio_micro, flagged) per document.

    ``hit_ratio_micro`` = floor(1e6 · hits/tokens) (0 for empty
    docs); ``flagged`` = 1 when the ratio exceeds ``max_ratio_micro``
    (default 2% — the soft-gate regime) OR the doc is non-empty with
    hits but too short for the ratio to mean anything (< 5 tokens
    with a hit is flagged outright).
    """
    text = F.lower(F.col(text_col))
    if combine:
        pat = "|".join(_term_pattern(t) for t in terms)
        hits = F.regexp_count(text, F.lit(pat))
    else:
        hits = None
        for t in terms:
            c = F.regexp_count(text, F.lit(_term_pattern(t)))
            hits = c if hits is None else hits + c
    toks = token_count(F.col(text_col))
    ratio = F.when(toks == 0, F.lit(0)).otherwise(
        F.floor(F.lit(MICRO) * hits / toks)
    )
    flagged = (
        (ratio > max_ratio_micro) | ((hits > 0) & (toks < 5))
    ).cast("int")
    return docs.select(
        F.col(id_col).alias(id_col),
        toks.cast("bigint").alias("n_tokens"),
        hits.cast("bigint").alias("n_hits"),
        ratio.cast("bigint").alias("hit_ratio_micro"),
        flagged.alias("flagged"),
    )


def filter_by_lexicon(
    docs: DataFrame,
    terms: tuple[str, ...] = DEFAULT_LEXICON,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio_micro: int = 20_000,
) -> DataFrame:
    """Corpus minus flagged pages — the flag predicate applied inside
    the scan itself (no join, no shuffle; the filter pushes down)."""
    text = F.lower(F.col(text_col))
    pat = "|".join(_term_pattern(t) for t in terms)
    hits = F.regexp_count(text, F.lit(pat))
    toks = token_count(F.col(text_col))
    ratio = F.when(toks == 0, F.lit(0)).otherwise(
        F.floor(F.lit(MICRO) * hits / toks)
    )
    flagged = (ratio > max_ratio_micro) | ((hits > 0) & (toks < 5))
    return docs.filter(~flagged)
