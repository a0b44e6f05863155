"""Model-based quality filtering: a trained logistic-regression text
classifier (the CCNet/DCLM "model quality signal" beside the rule-based
gates in operators/quality.py).

Scale shape — the part that matters at 100 TB:
- TRAINING is bounded: quality classifiers train on a labeled set that
  is tiny next to the corpus (10^4-10^6 docs), so the trainer takes a
  deterministic hash-ordered sample (the ivf/pq sampling device — no
  RNG state, replayable on resume), computes features INSIDE Spark
  (the same expressions scoring uses), Arrow-transfers the
  O(max_sample x n_features) matrix, and runs full-batch
  gradient descent in numpy on the driver. One Spark job total.
- SCORING is the corpus-wide pass and is pure JVM expression: the
  trained weights fold back into RAW feature space (standardization
  becomes an affine change of weights), so the score is a dot product
  + bias over regexp-count features — codegen'd, no Python, no
  shuffle, column-pruned to `text`.
- The decision threshold is on the LOGIT (sigmoid is monotone), which
  keeps the scoring expression exp-free: exact cross-engine arithmetic
  for the DuckDB oracle (`quality_lr_score`), same trick as lm_score's
  integer micro-log units (operators/lm.py).

Features are portable (regexp_count / length / split) so the DuckDB
twin renders the identical arithmetic (entry_queries.q_quality_lr).

Reference parity: justrach/pathik has no trained filtering; this is
part of the training-data-pipeline brief (VERDICT r2 family).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.text import token_count
from pathik_spark.functions.text_constants import LANG_MARKERS, PUNCT_CLASS

# Deterministic training-sample ceiling (rows collected to the driver).
LR_TRAIN_MAX_SAMPLE = 1 << 15

#: feature order is part of the model contract
QUALITY_LR_FEATURES = (
    "len_norm",
    "punct_ratio",
    "stop_ratio",
    "mean_wlen",
    "digit_ratio",
    "upper_ratio",
)


def quality_feature_cols(text_col: Column) -> list[Column]:
    """The 6 raw features as JVM expressions, in QUALITY_LR_FEATURES
    order. All bounded ratios (no standardization needed at score
    time — the trainer folds it into the weights)."""
    n_chars = F.length(text_col).cast("double")
    n_tokens = token_count(text_col).cast("double")
    n_punct = F.regexp_count(text_col, F.lit(PUNCT_CLASS)).cast("double")
    n_stop = F.regexp_count(F.lower(text_col), F.lit(LANG_MARKERS["en"])).cast("double")
    n_digit = F.regexp_count(text_col, F.lit("[0-9]")).cast("double")
    n_upper = F.regexp_count(text_col, F.lit("[A-Z]")).cast("double")
    return [
        F.least(n_chars / F.lit(2000.0), F.lit(1.0)).alias("len_norm"),
        (n_punct / (n_chars + F.lit(1.0))).alias("punct_ratio"),
        (n_stop / (n_tokens + F.lit(1.0))).alias("stop_ratio"),
        ((n_chars + F.lit(1.0)) / (n_tokens + F.lit(1.0))).alias("mean_wlen"),
        (n_digit / (n_chars + F.lit(1.0))).alias("digit_ratio"),
        (n_upper / (n_chars + F.lit(1.0))).alias("upper_ratio"),
    ]


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_sample: int = LR_TRAIN_MAX_SAMPLE,
    n_iters: int = 300,
    step: float = 1.0,
    l2: float = 1e-3,
) -> dict:
    """Train and return {"weights": [w1..w6], "bias": b} in RAW feature
    space (fold-in of the internal standardization), ready for
    score_quality_lr / the SQL twin.

    Deterministic end-to-end: hash-ordered sample, zero init,
    full-batch gradient descent (no minibatch RNG), fixed iteration
    count. Two invocations on the same input give bit-identical
    weights."""
    pdf = (
        labeled.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("double").alias("_y"),
            *quality_feature_cols(F.col(text_col)),
        )
        .withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(int(max_sample))
        .drop("_h", "_id")
        .toPandas()
    )
    if len(pdf) == 0:
        raise ValueError("train_quality_classifier: empty labeled input")
    y = pdf["_y"].to_numpy(dtype=np.float64)
    X = pdf[list(QUALITY_LR_FEATURES)].to_numpy(dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = (X - mu) / sd
    n = len(y)
    w = np.zeros(Z.shape[1])
    b = 0.0
    for _ in range(int(n_iters)):
        z = Z @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = (p - y) / n
        w -= step * (Z.T @ g + l2 * w)
        b -= step * float(g.sum())
    # fold standardization into raw-space weights:
    # z = w.(x - mu)/sd + b  ==  (w/sd).x + (b - w.mu/sd)
    w_raw = w / sd
    b_raw = float(b - np.dot(w, mu / sd))
    return {
        "weights": [float(v) for v in w_raw],
        "bias": b_raw,
        "n_train": int(n),
    }


def quality_logit_expr(text_col: Column, model: dict) -> Column:
    """The scoring expression: raw-space logit (dot product + bias),
    exp-free for exact cross-engine arithmetic."""
    feats = quality_feature_cols(text_col)
    z: Column = F.lit(float(model["bias"]))
    for feat, wi in zip(feats, model["weights"]):
        z = z + feat * F.lit(float(wi))
    return z


def score_quality_lr(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """(doc_id, logit, prob, keep): the corpus-wide scoring pass —
    scan-local, codegen'd, prunes to (id, text). ``keep`` thresholds
    the logit (0.0 == prob 0.5); ``prob`` is for human consumption
    (the oracled entry compares the exp-free logit)."""
    z = quality_logit_expr(F.col(text_col), model)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(z, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("prob"),
        (z > F.lit(float(threshold))).alias("keep"),
    )


#: A fixed reference model for the oracled entry query: weights chosen
#: (not trained) so the DuckDB twin is a static literal expression.
#: Signs encode the standard priors: longer + stopword-dense docs up,
#: punctuation/digit/upper spam down, mean word length mildly down.
PRETRAINED_QUALITY_MODEL = {
    "weights": [2.0, -8.0, 6.0, -0.15, -4.0, -2.0],
    "bias": -0.5,
}
