"""Unigram language-model quality scoring (CCNet-style).

CCNet ranks web documents by the perplexity of a small LM trained on a
trusted corpus: text whose token distribution matches the reference
reads as "clean", gibberish / boilerplate / wrong-language text scores
poorly. The engine's version is the relational unigram form:

- ``train_unigram_lm``: token -> log10 probability over a reference
  corpus, truncated to the ``vocab_size`` most frequent tokens (ties
  broken lexicographically), add-one smoothed over the truncated vocab.
  One groupBy on token, then ``orderBy(...).limit(k)`` — Spark plans a
  distributed TakeOrdered (per-partition top-k, merge on the driver),
  NOT a single-partition global sort, so vocab selection scales with
  the token table.

- ``lm_score``: per-document mean token log-prob and out-of-vocabulary
  rate. Tokens explode inside the scan task, hit the BROADCAST vocab
  (no corpus shuffle for the lookup), and re-aggregate on doc_id — the
  one shuffle, on the table's own key. Lower (more negative) mean_logp
  = higher perplexity = worse text.

Log-probs are stored as integer MICRO-log10 units (round(logp * 1e6)):
integer sums are associative, so the per-doc mean is bit-identical
regardless of partitioning or engine — the property the DuckDB oracle
(`lm_score`) relies on. Floating sums of per-token doubles would differ
in the 6th decimal between engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text

DEFAULT_VOCAB = 50_000
_MICRO = 1_000_000


def corpus_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tok): whitespace tokens of the normalized text (empty
    docs emit nothing)."""
    norm = normalized_text(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.split(norm, " ").alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok") != "")
    )


def train_unigram_lm(
    reference: DataFrame,
    vocab_size: int = DEFAULT_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(tok, logp_micro, total_mass): the ``vocab_size`` most frequent
    tokens with add-one smoothing p(tok) = (count+1) / (total+vocab+1),
    logp_micro = round(log10(p) * 1e6) as BIGINT. ``total_mass`` (the
    shared denominator) rides every row so scorers can recover the OOV
    floor probability 1/total_mass without a side channel."""
    counts = corpus_tokens(reference, text_col, id_col).groupBy("tok").agg(
        F.count("*").alias("n")
    )
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(vocab_size)
    total = top.agg(F.sum("n").alias("_t"), F.count("*").alias("_v")).select(
        (F.col("_t") + F.col("_v") + 1).cast("long").alias("total_mass")
    )
    return top.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log10((F.col("n") + 1) / F.col("total_mass")) * _MICRO)
        .cast("long")
        .alias("logp_micro"),
        "total_mass",
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tok, oov_rate, mean_logp): unigram LM score per doc.

    OOV tokens score the smoothing floor log10(1/total_mass); mean_logp
    is the integer micro-sum divided out at the end (deterministic
    under any partitioning). Docs with no tokens score (0, 1.0, 0.0) —
    callers gate on n_tok.
    """
    floor = lm.select(
        F.max(
            F.round(F.log10(1.0 / F.col("total_mass")) * _MICRO).cast("long")
        ).alias("floor_micro")
    )
    toks = corpus_tokens(docs, text_col, id_col)
    scored = toks.join(
        F.broadcast(lm.select("tok", "logp_micro")), "tok", "left"
    ).crossJoin(F.broadcast(floor))
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.round(
            F.sum(F.when(F.col("logp_micro").isNull(), 1).otherwise(0)) / F.count("*"),
            6,
        ).alias("oov_rate"),
        F.round(
            F.sum(F.coalesce(F.col("logp_micro"), F.col("floor_micro")))
            / (F.count("*") * F.lit(float(_MICRO))),
            6,
        ).alias("mean_logp"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tok"), F.lit(0)).cast("long").alias("n_tok"),
        F.coalesce(F.col("oov_rate"), F.lit(1.0)).alias("oov_rate"),
        F.coalesce(F.col("mean_logp"), F.lit(0.0)).alias("mean_logp"),
    )
