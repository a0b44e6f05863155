"""Trained language identification: multinomial naive Bayes over hashed
character n-grams — the fastText-style *model* signal beside the
marker-list heuristic in functions/text.lang_id.

Why NB and not LR here: the multinomial NB decision function is a pure
relational computation — per-class log-probabilities are one groupBy
over (lang, bucket) at train time, and scoring is explode → broadcast
model join → one groupBy on the doc key → argmax — so both halves run
as built-in Spark expressions with no driver-side optimizer loop, and
the DuckDB oracle (`langid_nb`) restates them exactly.

Scale shape:
- TRAIN: one distributed pass over the labeled set. The model is at
  most n_langs x n_buckets rows (hashed feature space, fastText's
  dimensionality trick) — always broadcastable.
- SCORE: char n-grams explode inside the scan task (substr over a
  sequence — no Python), hit the BROADCAST model, partial-aggregate
  per (doc_id, lang), and the only shuffle is on the doc key. The
  missing-(bucket,lang) floor term folds into n_grams * floor_l, so
  the inner join never fans out to the full doc x lang x bucket
  lattice.
- All log-probs are integer MICRO-log10 units (round(log10(p)*1e6)):
  associative integer sums, so scores — and therefore the argmax — are
  bit-identical under any partitioning and across engines (same device
  as operators/lm.py / operators/dsir.py).

Ties break to the lexicographically smallest language at equal score
(row_number over (score DESC, lang ASC)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text, portable_hash64

DEFAULT_BUCKETS = 4096
DEFAULT_NGRAM = 3
_MICRO = 1_000_000


def char_ngram_features(
    docs: DataFrame,
    n: int = DEFAULT_NGRAM,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, cnt): counts of character n-grams of the
    normalized text hashed into ``n_buckets`` slots. Grams come from
    substr over a sequence (scan-local, no Python); docs shorter than
    ``n`` chars emit nothing."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        normalized_text(F.col(text_col)).alias("_norm"),
    )
    n_grams = F.greatest(F.length("_norm") - F.lit(n - 1), F.lit(0))
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.col("_norm").substr(i, F.lit(n)))
    return (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            F.pmod(portable_hash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_langid_nb(
    labeled: DataFrame,
    n: int = DEFAULT_NGRAM,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> dict[str, DataFrame]:
    """Train the NB model over a labeled (text, lang) set.

    Returns two small DataFrames (both broadcastable by construction):
    - ``model``: (lang, bucket, lp) — add-one-smoothed per-class
      feature log-probs, lp = round(log10((cnt+1)/(total_l+n_buckets))
      * 1e6), only for observed (lang, bucket) pairs;
    - ``langs``: (lang, prior, floor_l) — integer micro-log10 class
      prior (doc-frequency) and the class's unseen-bucket floor
      log10(1/(total_l+n_buckets)).
    """
    feats = char_ngram_features(labeled, n, n_buckets, text_col, id_col).join(
        labeled.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    counts = feats.groupBy("lang", "bucket").agg(F.sum("cnt").alias("n"))
    totals = counts.groupBy("lang").agg(
        (F.sum("n") + n_buckets).cast("long").alias("mass")
    )
    model = counts.join(totals, "lang").select(
        "lang",
        "bucket",
        F.round(F.log10((F.col("n") + 1) / F.col("mass")) * _MICRO)
        .cast("long")
        .alias("lp"),
    )
    n_docs = labeled.count()
    langs = (
        labeled.groupBy(F.col(lang_col).alias("lang"))
        .agg(F.count("*").alias("n_docs"))
        .join(totals, "lang")
        .select(
            "lang",
            F.round(F.log10(F.col("n_docs") / F.lit(float(n_docs))) * _MICRO)
            .cast("long")
            .alias("prior"),
            F.round(F.log10(1.0 / F.col("mass")) * _MICRO).cast("long").alias("floor_l"),
        )
    )
    return {"model": model, "langs": langs}


def langid_nb_scores(
    docs: DataFrame,
    model: dict[str, DataFrame],
    n: int = DEFAULT_NGRAM,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, lang, score_micro): full per-class NB log-posteriors.

    score_l = prior_l + n_grams*floor_l + Σ_{(b) seen in l} cnt_b *
    (lp_{l,b} − floor_l) — the floor-folding identity that keeps the
    join INNER (only observed model rows fan out; a doc never joins
    against buckets a class has no row for)."""
    feats = char_ngram_features(docs, n, n_buckets, text_col, id_col)
    totals = feats.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("n_grams"))
    partial = (
        feats.join(F.broadcast(model["model"]), "bucket")
        .join(F.broadcast(model["langs"].select("lang", "floor_l")), "lang")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * (F.col("lp") - F.col("floor_l"))).alias("part"))
    )
    lattice = totals.crossJoin(F.broadcast(model["langs"]))
    return (
        lattice.join(partial, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            (
                F.col("prior")
                + F.col("n_grams") * F.col("floor_l")
                + F.coalesce(F.col("part"), F.lit(0))
            )
            .cast("long")
            .alias("score_micro"),
        )
    )


def langid_nb_predict(
    docs: DataFrame,
    model: dict[str, DataFrame],
    n: int = DEFAULT_NGRAM,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pred_lang, score_micro, margin_micro): argmax class per
    document plus the runner-up margin (the abstention signal — small
    margin = uncertain). Docs with no n-grams are absent (callers keep
    them as unknown)."""
    scores = langid_nb_scores(docs, model, n, n_buckets, text_col, id_col)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("lang"))
    ranked = scores.withColumn("rn", F.row_number().over(w)).withColumn(
        "next_score", F.lead("score_micro").over(w)
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        "score_micro",
        F.coalesce(F.col("score_micro") - F.col("next_score"), F.lit(0))
        .cast("long")
        .alias("margin_micro"),
    )
