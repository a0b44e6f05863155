"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw web documents whose hashed-n-gram distribution matches a
small trusted TARGET corpus: fit bag-of-hashed-ngram unigram models on
the target (p) and on the raw pool (q), score each raw document with
the log importance weight  log w(x) = Σ_grams [log p(bucket) −
log q(bucket)], then resample via the Gumbel-top-k trick so the
selected set follows the importance distribution rather than just the
arg-top-k (which would collapse onto near-duplicates of the target).

Spark shape (all built-in expressions, no per-row Python):

- features are unigrams+bigrams hashed into ``n_buckets`` slots — the
  published method's dimensionality trick that makes both "LMs" fixed,
  tiny (≤ n_buckets rows) and therefore BROADCAST-able: the raw corpus
  is scanned once for its own LM (one map-side-combined groupBy on the
  bucket id — at most n_buckets rows reach the shuffle regardless of
  corpus size) and once for scoring, and never shuffles on anything
  but its own doc key.
- log-probs and Gumbel noise are integer MICRO-log10/micro units
  (round(x*1e6)), so per-doc sums are associative and the selection
  order is bit-identical across partitionings and engines — the
  property the DuckDB oracle (`dsir_weights`/`dsir_select`) checks.
- selection is orderBy(key).limit(k): Spark plans a distributed
  TakeOrdered (per-partition top-k + driver merge), never a global
  sort.

The deterministic Gumbel: u = (hash60(salt:doc_id) mod 1e6 + 0.5)/1e6,
g = −ln(−ln(u)) — a pure function of (salt, doc_id), so re-running the
job (or running it at two cluster sizes) selects the SAME documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text, portable_hash64
from pathik_spark.operators.sampling import DENOM, sample_bucket

DEFAULT_BUCKETS = 8192
_MICRO = 1_000_000


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, cnt): counts of unigrams + bigrams of the
    normalized text, hashed into ``n_buckets`` slots with the portable
    60-bit hash. The gram array is built scan-local (split + transform
    over a sequence), exploded once, and collapsed by a map-side-partial
    groupBy — the shuffle carries at most n_buckets rows per doc."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("toks"),
        (normalized_text(F.col(text_col)) == "").alias("_empty"),
    )
    n_bi = F.greatest(F.size("toks") - 1, F.lit(0))
    bi_idx = F.when(n_bi >= 1, F.sequence(F.lit(0), n_bi - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        bi_idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", (i + 1).cast("int")),
            F.element_at("toks", (i + 2).cast("int")),
        ),
    )
    grams = F.when(F.col("_empty"), F.array().cast("array<string>")).otherwise(
        F.concat(F.col("toks"), bigrams)
    )
    exploded = toks.select("doc_id", F.explode(grams).alias("gram"))
    return (
        exploded.select(
            "doc_id",
            F.pmod(portable_hash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_feature_lm(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, logp_micro, total_mass): add-one-smoothed hashed-ngram
    unigram model — p(b) = (count_b + 1) / (total + n_buckets),
    logp_micro = round(log10(p)*1e6) as BIGINT. Buckets never seen in
    ``docs`` are absent; scorers recover their floor probability
    1/total_mass from the total_mass column (same convention as
    operators/lm.py). At most ``n_buckets`` rows — always broadcastable."""
    counts = (
        hashed_ngram_features(docs, n_buckets, text_col, id_col)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("n"))
    )
    total = counts.agg(
        (F.coalesce(F.sum("n"), F.lit(0)) + n_buckets).cast("long").alias("total_mass")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.round(F.log10((F.col("n") + 1) / F.col("total_mass")) * _MICRO)
        .cast("long")
        .alias("logp_micro"),
        "total_mass",
    )


def dsir_log_weights(
    raw: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, logw_micro, logw): per-document log importance
    weight Σ cnt_b * (log p_target(b) − log q_raw(b)) in integer micro
    units. Both LMs are broadcast (≤ n_buckets rows); the corpus side
    stays scan-local until the one groupBy on its own doc key. Docs with
    no grams weigh 0 (neutral) — callers gate on n_grams."""
    t_floor = target_lm.select(
        F.max(
            F.round(F.log10(1.0 / F.col("total_mass")) * _MICRO).cast("long")
        ).alias("t_floor")
    )
    q_floor = raw_lm.select(
        F.max(
            F.round(F.log10(1.0 / F.col("total_mass")) * _MICRO).cast("long")
        ).alias("q_floor")
    )
    feats = hashed_ngram_features(raw, n_buckets, text_col, id_col)
    joined = (
        feats.join(
            F.broadcast(target_lm.select("bucket", F.col("logp_micro").alias("lp_t"))),
            "bucket",
            "left",
        )
        .join(
            F.broadcast(raw_lm.select("bucket", F.col("logp_micro").alias("lp_q"))),
            "bucket",
            "left",
        )
        .crossJoin(F.broadcast(t_floor))
        .crossJoin(F.broadcast(q_floor))
    )
    agg = joined.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(
            F.col("cnt")
            * (
                F.coalesce(F.col("lp_t"), F.col("t_floor"))
                - F.coalesce(F.col("lp_q"), F.col("q_floor"))
            )
        )
        .cast("long")
        .alias("logw_micro"),
    )
    base = raw.select(F.col(id_col).alias("doc_id"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("logw_micro"), F.lit(0)).cast("long").alias("logw_micro"),
        F.round(F.coalesce(F.col("logw_micro"), F.lit(0)) / F.lit(float(_MICRO)), 6).alias(
            "logw"
        ),
    )


def gumbel_key_micro(id_col="doc_id", salt: str = "dsir", temperature: float = 1.0):
    """Deterministic Gumbel noise in integer micro units: u from the
    salted hash lattice (never 0 or 1), g = −ln(−ln(u)). Adding it to
    logw_micro/temperature realizes Gumbel-top-k sampling from the
    softmax of logw/temperature — reproducible on any cluster."""
    key = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (sample_bucket(key.cast("string"), salt) + F.lit(0.5)) / F.lit(float(DENOM))
    g = -F.log(-F.log(u))
    return F.round(g * _MICRO).cast("long")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    temperature: float = 1.0,
    salt: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end DSIR: train both feature LMs, weigh the raw pool,
    Gumbel-top-k resample ``k`` documents. Returns (doc_id, n_grams,
    logw, key_micro) sorted by selection key. The only corpus-sized
    work: two scans (LM counts, scoring) + one TakeOrdered."""
    target_lm = train_feature_lm(target, n_buckets, text_col, id_col)
    raw_lm = train_feature_lm(raw, n_buckets, text_col, id_col)
    weights = dsir_log_weights(raw, target_lm, raw_lm, n_buckets, text_col, id_col)
    scale = F.lit(1.0 / temperature)
    keyed = weights.withColumn(
        "key_micro",
        (F.round(F.col("logw_micro") * scale).cast("long") + gumbel_key_micro("doc_id", salt)),
    )
    return (
        keyed.orderBy(F.desc("key_micro"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "n_grams", "logw", "key_micro")
    )
