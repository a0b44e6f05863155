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

from pyspark.sql import DataFrame, Window
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


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(tok, n): corpus token frequencies — ONE map-side-combined
    groupBy, shareable between train_unigram_lm and train_bigram_lm so
    a joint training pair scans the reference corpus once."""
    return corpus_tokens(docs, text_col, id_col).groupBy("tok").agg(
        F.count("*").alias("n")
    )


def _floor_micro(lm: DataFrame) -> DataFrame:
    """The OOV floor log10(1/total_mass) in micro units — the single
    definition both the unigram and bigram scorers coalesce onto."""
    return lm.select(
        F.max(
            F.round(F.log10(1.0 / F.col("total_mass")) * _MICRO).cast("long")
        ).alias("floor_micro")
    )


def train_unigram_lm(
    reference: DataFrame,
    vocab_size: int = DEFAULT_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """(tok, logp_micro, total_mass): the ``vocab_size`` most frequent
    tokens with add-one smoothing p(tok) = (count+1) / (total+vocab+1),
    logp_micro = round(log10(p) * 1e6) as BIGINT. ``total_mass`` (the
    shared denominator) rides every row so scorers can recover the OOV
    floor probability 1/total_mass without a side channel.

    ``counts``: optionally pass a precomputed ``token_counts`` table so
    a unigram+bigram training pair scans the reference corpus ONCE."""
    if counts is None:
        counts = token_counts(reference, text_col, id_col)
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
    floor = _floor_micro(lm)
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


def perplexity_buckets(
    scored: DataFrame,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    lang_col: str | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing: rank documents by LM score and
    cut the ranking into equal-population buckets (head = best-scoring
    third, tail = worst). CCNet (Wenzek et al. 2020) trains on the head
    and middle and drops (or down-weights) the tail.

    ``scored`` is the output of :func:`lm_score` (needs ``doc_id`` and
    ``mean_logp``; higher mean_logp = lower perplexity = better text),
    optionally carrying ``lang_col`` so bucketing is per-language — the
    CCNet formulation, where each language gets its own head/middle/tail
    regardless of how its absolute perplexities compare to other
    languages'.

    The cut is RANK-exact, not quantile-approximate: row_number over
    (mean_logp DESC, doc_id ASC) — a deterministic total order since
    mean_logp is derived from integer micro-log10 sums — and
    bucket_idx = floor(rank-1) * n_buckets / count. Integer-in-double
    arithmetic, bit-identical in any engine (the DuckDB oracle restates
    it verbatim). The window sorts each language partition: at 100 TB
    that is one range-partitioned sort per language — acceptable for a
    once-per-corpus pass, but when only the *cutoffs* are needed use
    :func:`perplexity_cutoffs` + :func:`bucket_by_cutoffs`, which keep
    the corpus scan-local.
    """
    if len(labels) < 2:
        raise ValueError("need at least 2 bucket labels")
    part = [F.col(lang_col)] if lang_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.desc("mean_logp"), F.asc("doc_id"))
    wc = Window.partitionBy(*part)
    n = len(labels)
    idx = F.floor(
        (F.row_number().over(w) - 1).cast("double")
        * n
        / F.count("*").over(wc)
    ).cast("int")
    arr = F.array(*[F.lit(x) for x in labels])
    return scored.withColumn("ppl_bucket", F.element_at(arr, idx + 1))


def perplexity_cutoffs(
    scored: DataFrame,
    fractions: tuple[float, ...] = (1 / 3, 2 / 3),
    lang_col: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale path for CCNet bucketing: per-language approximate
    mean_logp cutoffs at the given head-fractions (descending score
    order), ONE aggregation over the corpus — no global sort. Returns
    (lang?, cutoffs array<double>) with len(fractions) entries, where
    cutoffs[i] is the score at the i-th cut; a doc is in bucket i iff
    its mean_logp is above cutoffs[i] but not above cutoffs[i-1].
    ``percentile_approx`` (Greenwald-Khanna) is within 1/accuracy of
    the exact quantile — the production arm trades exact bucket
    populations for a scan-local corpus pass."""
    # fraction f of docs ABOVE the cutoff == the (1-f) quantile of mean_logp
    qs = F.array(*[F.lit(1.0 - f) for f in fractions])
    agg = F.percentile_approx("mean_logp", qs, F.lit(accuracy)).alias("cutoffs")
    if lang_col:
        return scored.groupBy(lang_col).agg(agg)
    return scored.agg(agg)


def bucket_by_cutoffs(
    scored: DataFrame,
    cutoffs: DataFrame,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    lang_col: str | None = None,
) -> DataFrame:
    """Assign ppl_bucket from broadcast cutoffs (the
    :func:`perplexity_cutoffs` output): corpus side stays scan-local —
    the pairing that survives 100 TB. len(labels) must be
    len(cutoffs)+1."""
    joined = (
        scored.join(F.broadcast(cutoffs), on=lang_col, how="left")
        if lang_col
        else scored.crossJoin(F.broadcast(cutoffs))
    )
    expr = None
    for i, lab in enumerate(labels[:-1]):
        cond = F.col("mean_logp") >= F.element_at("cutoffs", i + 1)
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    expr = expr.otherwise(F.lit(labels[-1]))
    return joined.withColumn("ppl_bucket", expr).drop("cutoffs")


def _token_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1, w2): consecutive-token pairs of the normalized text
    plus one (doc_id, NULL, first_token) row per non-empty doc — the
    bigram scorer's unit of work (one row per TOKEN: the first token is
    conditioned on nothing, every later token on its predecessor).
    Built scan-locally with higher-order functions; empty docs emit
    nothing."""
    norm = normalized_text(F.col(text_col))
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(norm, " ").alias("toks")
    ).filter(F.element_at("toks", 1) != "")
    n = F.size("toks")
    pair_idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        pair_idx,
        lambda i: F.struct(
            F.element_at("toks", (i + 1).cast("int")).alias("w1"),
            F.element_at("toks", (i + 2).cast("int")).alias("w2"),
        ),
    )
    first = F.array(
        F.struct(
            F.lit(None).cast("string").alias("w1"),
            F.element_at("toks", 1).alias("w2"),
        )
    )
    return toks.select("doc_id", F.explode(F.concat(first, pairs)).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def train_bigram_lm(
    reference: DataFrame,
    vocab_size: int = DEFAULT_VOCAB,
    lam: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM over the truncated vocab —
    one smoothing step closer to CCNet's KenLM scorer than the unigram
    above:

        p(w2|w1) = lam * c(w1 w2)/c(w1 ·) + (1-lam) * p_uni(w2)

    with p_uni the add-one unigram over the same vocab/mass convention
    as train_unigram_lm. Only pairs with BOTH tokens in vocab are
    materialized (<= observed in-vocab pairs, broadcastable for the
    vocab sizes LM gating uses); everything else decomposes onto the
    unigram at scoring time. Returns (w1, w2, logp_micro) as integer
    micro-log10 — the associative-exact convention the DuckDB oracle
    (`bigram_lm_score`) restates.

    Shape: token counts and pair counts are each ONE map-side-combined
    groupBy over the reference corpus; c(w1 ·) reduces the (small) pair
    count table, never the corpus. ``counts``: pass the shared
    ``token_counts`` table to avoid re-tokenizing the reference when a
    unigram model is trained alongside.
    """
    if counts is None:
        counts = token_counts(reference, text_col, id_col)
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(vocab_size)
    total = top.agg(F.sum("n").alias("_t"), F.count("*").alias("_v")).select(
        (F.col("_t") + F.col("_v") + 1).cast("long").alias("total_mass")
    )
    pairs = _token_pairs(reference, text_col, id_col).filter(F.col("w1").isNotNull())
    v1 = top.select(F.col("tok").alias("w1"))
    v2 = top.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    c12 = (
        pairs.join(F.broadcast(v1), "w1")
        .join(F.broadcast(v2.select("w2")), "w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    return (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(v2), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.round(
                F.log10(
                    F.lit(lam) * (F.col("c12") / F.col("c1"))
                    + F.lit(1.0 - lam)
                    * ((F.col("n2") + 1) / F.col("total_mass"))
                )
                * _MICRO
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )


def bigram_lm_score(
    docs: DataFrame,
    bigram_lm: DataFrame,
    unigram_lm: DataFrame,
    lam: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tok, mean_logp): interpolated-bigram score per doc.

    Per token: a seen in-vocab bigram takes the trained JM log-prob; an
    unseen pair backs off to log10((1-lam) * p_uni(w2)) — which in
    integer micro units is EXACTLY uni_logp_micro + round(log10(1-lam)
    * 1e6) by convention (the convention is the spec; the oracle states
    the same sum) — and the first token of a doc scores pure unigram.
    OOV w2 takes the unigram floor 1/total_mass in the same positions.

    Scale shape mirrors lm_score: pair construction is scan-local, both
    model joins are broadcasts, the one shuffle re-aggregates on the
    table's own doc key, and the integer micro-sum makes the mean
    partitioning/engine-exact.
    """
    import math

    shift = int(round(math.log10(1.0 - lam) * _MICRO))
    floor = _floor_micro(unigram_lm)
    rows = _token_pairs(docs, text_col, id_col)
    scored = (
        rows.join(
            F.broadcast(
                bigram_lm.select("w1", "w2", F.col("logp_micro").alias("_bg"))
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            F.broadcast(
                unigram_lm.select(
                    F.col("tok").alias("w2"), F.col("logp_micro").alias("_uni")
                )
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(floor))
        .select(
            "doc_id",
            F.when(F.col("_bg").isNotNull(), F.col("_bg"))
            .when(
                F.col("w1").isNull(),
                F.coalesce(F.col("_uni"), F.col("floor_micro")),
            )
            .otherwise(
                F.coalesce(F.col("_uni"), F.col("floor_micro")) + F.lit(shift)
            )
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.round(F.sum("lp") / (F.count("*") * F.lit(float(_MICRO))), 6).alias(
            "mean_logp"
        ),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tok"), F.lit(0)).cast("long").alias("n_tok"),
        F.coalesce(F.col("mean_logp"), F.lit(0.0)).alias("mean_logp"),
    )
