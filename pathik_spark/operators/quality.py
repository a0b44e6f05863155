"""Repetition-based quality signals for web-text corpora.

The Gopher/RefinedWeb-style repetition filters: a document whose lines
repeat, whose tokens repeat, or whose most-frequent bigram dominates is
boilerplate/spam with high probability and gets filtered before
training. All signals here are PER-DOCUMENT array expressions — no
shuffle, no UDF, no groupBy: at 100 TB each document's signals compute
inside the scan task that read it (whole-stage codegen), and the only
wide operation a caller ever adds is their own downstream use.

The top-bigram fraction deliberately avoids the textbook
explode->groupBy(doc, bigram)->max plan (two shuffles keyed by doc_id):
sorting the document's bigram array and taking the longest equal-run
via ``aggregate`` gives the same count in O(L log L) local work.

Thresholds follow Gopher (Rae et al. 2021, Table A1) where comparable:
dup-line <= 0.30, dup-token <= 0.50 (token form of their 0.2-0.6 band),
top-bigram <= 0.20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text

DUP_LINE_MAX = 0.30
DUP_TOKEN_MAX = 0.50
TOP_BIGRAM_MAX = 0.20
MIN_TOKENS = 5


def _frac(dup, total):
    return F.when(
        total > 0, F.round(dup.cast("double") / total.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def _max_run(sorted_arr):
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the max multiplicity of any element: one aggregate pass
    with a (prev, cur, best) accumulator."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        cur = F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["cur"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"), cur.alias("cur"), F.greatest(acc["best"], cur).alias("best")
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, dup_line_frac, dup_token_frac, top_bigram_frac,
    keep): the repetition-quality row per document.

    - dup_line_frac: fraction of non-blank lines that are duplicates of
      an earlier line (1 - distinct/total over trimmed lines).
    - dup_token_frac: same over whitespace tokens of the normalized
      (lowercased, ws-collapsed) text.
    - top_bigram_frac: occurrences of the most frequent token bigram
      over total bigrams.
    - keep: the conjunctive Gopher-style filter at the module
      thresholds (MIN_TOKENS floor so trivial docs don't pass by
      vacuity).
    """
    text = F.col(text_col)
    norm = normalized_text(text)
    toks = F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    n_tokens = F.size(toks)

    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    n_lines = F.size(lines)
    dup_line = _frac(n_lines - F.size(F.array_distinct(lines)), n_lines)
    dup_token = _frac(n_tokens - F.size(F.array_distinct(toks)), n_tokens)

    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tokens - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams)
    top_bigram = _frac(_max_run(F.sort_array(bigrams)), n_bigrams)

    out = docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        dup_line.alias("dup_line_frac"),
        dup_token.alias("dup_token_frac"),
        top_bigram.alias("top_bigram_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("dup_line_frac") <= DUP_LINE_MAX)
        & (F.col("dup_token_frac") <= DUP_TOKEN_MAX)
        & (F.col("top_bigram_frac") <= TOP_BIGRAM_MAX),
    )
