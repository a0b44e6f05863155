"""Corpus reporting: the dataset-card rollup for a cleaned corpus.

Every released webtext corpus ships a composition table — documents /
tokens / bytes per (language, source), plus the duplication rate the
dedup stage will face. ``corpus_report`` computes it in one pass: a
single groupBy on low-cardinality keys (languages x sources is tiny),
with map-side partial aggregation doing almost all the work; the
distinct-content count rides the same shuffle as a two-level
aggregate. No UDFs; token counts reuse the engine's normalization so
the report matches what chunking/packing will actually see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text


def corpus_report(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus composition: (group_cols..., n_docs, n_tokens,
    n_chars, avg_tokens, n_distinct, dup_rate).

    n_tokens counts whitespace tokens of the normalized text (empty
    docs count 0); n_distinct counts distinct normalized contents in
    the group; dup_rate = 1 - n_distinct/n_docs.
    """
    norm = normalized_text(F.col(text_col))
    toks = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    prepped = docs.select(
        *group_cols,
        toks.cast("long").alias("_n_tok"),
        F.length(F.col(text_col)).cast("long").alias("_n_chr"),
        F.md5(norm).alias("_chash"),
    )
    agg = prepped.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("_n_tok").alias("n_tokens"),
        F.sum("_n_chr").alias("n_chars"),
        F.countDistinct("_chash").alias("n_distinct"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens").cast("double") / F.col("n_docs"), 6).alias("avg_tokens"),
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
    )
