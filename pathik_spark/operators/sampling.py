"""Deterministic corpus sampling and domain-mix rebalancing.

Training-data pipelines rarely train on the raw crawl distribution: a
handful of hosts dominate a web corpus (the same zipf skew the crawl
scheduler fights), so the corpus is re-weighted to a target mix —
"cap every domain", "20% code, 30% encyclopedic, ...". Two primitives:

- ``hash_sample``: keep a row iff a salted 60-bit hash of its key falls
  under ``rate``. No RNG, no state: the decision is a pure function of
  (salt, key), so re-running the job — or running it on two cluster
  sizes — selects the SAME rows. That determinism is what makes samples
  reproducible at 100 TB and lets the DuckDB oracle reproduce them
  bit-for-bit.
- ``stratified_sample``: per-group rates via a BROADCAST join of the
  (tiny) rates table. The corpus side never shuffles — the probe and
  the filter evaluate inside the scan tasks.

``domain_mix_rates`` derives the per-group rates that turn observed
group counts into a target proportion mix under a global cap: one small
aggregation (#groups rows — domains, not documents), then pure
arithmetic. The only corpus-sized work in the whole rebalance is one
scan + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import portable_hash64

# denominator of the rate lattice: rates are quantized to 1/DENOM steps
# so the threshold compare is exact integer arithmetic in every engine
DENOM = 1_000_000


def sample_bucket(key_col, salt: str = "sample"):
    """Deterministic bucket in [0, DENOM): pmod(hash60(salt || ':' || key))."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(
        portable_hash64(F.concat(F.lit(salt + ":"), key)), F.lit(DENOM)
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "url", salt: str = "sample"
) -> DataFrame:
    """Keep each row iff its deterministic bucket < rate * DENOM."""
    threshold = int(round(rate * DENOM))
    return df.filter(sample_bucket(key_col, salt) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "url",
    salt: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test split: adds a ``split``
    column by cutting the bucket lattice at the cumulative weights
    (insertion order of ``weights``; they must sum to ~1). Same key +
    salt => same split on any cluster, any partitioning — the property
    that makes held-out sets stable across pipeline re-runs. Pure
    expression, scan-local."""
    total = sum(weights.values())
    if not weights or abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = sample_bucket(key_col, salt)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cut = F.lit(int(round(cum * DENOM)))
        case = F.when(bucket < cut, F.lit(name))
        expr = case if expr is None else expr.when(bucket < cut, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    group_col: str = "host",
    key_col: str = "url",
    salt: str = "sample",
) -> DataFrame:
    """Per-group deterministic sampling.

    ``rates`` is a small table (group_col, rate double in [0,1]) —
    one row per stratum. Groups absent from ``rates`` are dropped
    (rate 0). The join is an explicit broadcast: at corpus scale the
    rates table is thousands of rows, the corpus is billions, and the
    filter must happen inside the scan.
    """
    thresholds = rates.select(
        group_col, F.round(F.col("rate") * DENOM).cast("long").alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col, "inner")
        .filter(sample_bucket(key_col, salt) < F.col("_thr"))
        .drop("_thr")
    )


def domain_mix_rates(
    df: DataFrame,
    targets: dict[str, float],
    group_col: str = "host",
    key_col: str = "doc_id",
) -> DataFrame:
    """Derive per-group sampling rates that realize a target mix.

    ``targets`` maps group -> desired proportion (need not sum to 1;
    they are normalized). The output size is maximized subject to
    (a) every group's rate <= 1 (you cannot upsample without
    replacement) and (b) realized proportions == normalized targets:
    the classic water-filling scale = min over groups of
    available_g / target_g.

    Returns (group_col, n_available, rate) — #groups rows. The corpus
    is touched exactly once (the count aggregation, map-side partial);
    the arithmetic runs on the driver over the tiny counts result.
    """
    total_target = sum(targets.values())
    norm = {g: t / total_target for g, t in targets.items()}
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
        if r[group_col] in norm
    }
    # water-filling: the binding group is the one with the least
    # available data relative to its target share. A targeted group
    # with ZERO available docs would drive scale to 0 and silently
    # empty the whole mix — almost always a misspelled target key or
    # a stale group — so surface it loudly instead.
    empty = sorted(g for g, t in norm.items() if t > 0 and counts.get(g, 0) == 0)
    if empty:
        import warnings

        warnings.warn(
            f"domain_mix_rates: targeted group(s) with zero available "
            f"documents {empty} force every rate to 0 (strict "
            f"water-filling) — the mixed corpus will be EMPTY. "
            f"Drop them from targets if unintended.",
            stacklevel=2,
        )
    scale = min(
        (counts.get(g, 0) / t for g, t in norm.items() if t > 0), default=0.0
    )
    rows = [
        (g, counts.get(g, 0), min(1.0, (norm[g] * scale) / counts[g]) if counts.get(g) else 0.0)
        for g in norm
    ]
    spark = df.sparkSession
    return spark.createDataFrame(rows, schema=f"{group_col} string, n_available long, rate double")


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    group_col: str = "host",
    key_col: str = "url",
    salt: str = "mix",
) -> DataFrame:
    """Rebalance df to the target mix: derive rates, then one
    deterministic stratified pass over the corpus."""
    rates = domain_mix_rates(df, targets, group_col=group_col).select(group_col, "rate")
    return stratified_sample(df, rates, group_col=group_col, key_col=key_col, salt=salt)


def temperature_mix_rates(
    df: DataFrame, alpha: float = 0.3, group_col: str = "lang"
) -> DataFrame:
    """Temperature-scaled group sampling rates (the mC4/mT5 recipe —
    Raffel et al. / Xue et al.: sample language l with p_l ∝ n_l^alpha
    to keep head languages from drowning the tail).

    Realized without replacement by strict water-filling: the target
    proportions p_l ∝ n_l^alpha are achieved at the maximum total size
    with every rate <= 1, which closes to

        rate_g = (n_min / n_g) ** (1 - alpha)

    (binding group = the smallest; alpha=1 keeps the raw distribution,
    alpha=0 equalizes every group down to n_min — the UniMax limit).
    Rates are rounded to the 6-decimal lattice BEFORE thresholding so
    the selection is reproducible cross-engine.

    One tiny aggregation (#groups rows) + driver arithmetic — the
    corpus itself is untouched here. Returns (group_col, n_available,
    rate).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
        if r[group_col] is not None
    }
    if not counts:
        raise ValueError("temperature_mix_rates: no non-null groups")
    n_min = min(counts.values())
    rows = [
        (g, n, round((n_min / n) ** (1.0 - alpha), 6)) for g, n in counts.items()
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, schema=f"{group_col} string, n_available long, rate double"
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Rebalance df toward the temperature-flattened group mix.

    The rates are stated IN-PLAN (groupBy counts -> broadcast min ->
    pow), not via a driver collect: the whole rebalance stays a lazy
    transformation, so facade pipelines (api.prepare_training_corpus)
    keep their everything-is-lazy contract and nothing upstream runs at
    plan-construction time. Same closed form as temperature_mix_rates;
    the corpus-sized work is one count aggregation plus the scan-local
    broadcast-rates filter."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count("*").alias("_n"))
    )
    nmin = counts.agg(F.min("_n").alias("_nm"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        group_col,
        F.round(
            F.pow(F.col("_nm") / F.col("_n"), F.lit(1.0 - alpha)), 6
        ).alias("rate"),
    )
    return stratified_sample(
        df, rates, group_col=group_col, key_col=key_col, salt=salt
    )


def best_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "host",
    order_col: str = "quality",
    key_col: str = "doc_id",
    n_salts: int = 0,
) -> DataFrame:
    """Keep the ``k`` best rows of every group — the "cap every domain
    at its k best pages" curation move (the per-host twin of the
    politeness scheduler's per-host budget, applied to the corpus
    instead of the frontier).

    Ordering is (order_col DESC, key_col ASC): the tie-break on the key
    makes the selection deterministic, so re-runs and the DuckDB oracle
    (`best_per_group`) agree exactly. ``n_salts > 0`` switches to the
    scheduler's two-phase salted window (phase 1 keeps <= k per
    (group, salt-of-key); phase 2 ranks the <= n_salts*k survivors) —
    use at scale, where one domain can put millions of rows under one
    window partition. Output keeps all input columns plus ``rnk``.
    """
    order = [F.col(order_col).desc(), F.col(key_col).asc()]
    out = df
    if n_salts > 0:
        salt = F.pmod(
            portable_hash64(F.col(key_col).cast("string")), F.lit(n_salts)
        )
        local = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
        out = (
            out.withColumn("_lr", F.row_number().over(local))
            .filter(F.col("_lr") <= k)
            .drop("_lr")
        )
    win = Window.partitionBy(group_col).orderBy(*order)
    return (
        out.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def bucket_balanced_sample(
    df: DataFrame,
    k: int,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    order_col: str | None = None,
) -> DataFrame:
    """Embedding-diversity subset: cap every region of embedding space
    at its ``k`` best rows. Coarse clusters are data-independent SRP
    buckets (ann.make_lsh_bucket_udf — deterministic fixed-seed
    hyperplane signs, one matmul per Arrow batch), so unlike k-means
    cluster-balancing there is no trained state: the sample is
    reproducible across runs/partitionings and SQL-oracle-exact
    (`bucket_balanced`). SemDeDup removes near-duplicates WITHIN a
    cluster; this caps how much any one topic region contributes to the
    corpus at all — the cluster-balanced curation complement.

    Selection per bucket is (order_col DESC when given, id ASC)
    row_number <= k — the best_per_group discipline. 2^n_planes buckets:
    raise n_planes at scale so per-bucket window partitions stay small
    (16 planes = 65k buckets; the window shuffles on the bucket key
    only). Output keeps all input columns plus ``bucket`` and ``rnk``.
    """
    from pathik_spark.operators.ann import make_lsh_bucket_udf

    bucketed = df.withColumn(
        "bucket", make_lsh_bucket_udf(n_planes, dim)(F.col(vec_col))
    )
    order = ([F.col(order_col).desc()] if order_col else []) + [
        F.col(id_col).asc()
    ]
    win = Window.partitionBy("bucket").orderBy(*order)
    return (
        bucketed.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def exact_k_sample(
    df: DataFrame, k: int, key_col: str = "doc_id", salt: str = "ksample"
) -> DataFrame:
    """Exactly-k deterministic uniform sample: the k rows with the
    smallest salted portable hash of their key. Unlike rate-based
    ``hash_sample`` (whose output size is binomial) the count is exact,
    and unlike a random ``ORDER BY rand() LIMIT k`` it is reproducible
    on any cluster and partitioning. Physical shape is TakeOrdered
    (per-partition top-k then driver merge of k-row heads), never a
    global sort. Changing ``salt`` redraws the sample."""
    if k < 0:
        raise ValueError("k must be >= 0")
    # salt passed through verbatim (portable_hash64 prefixes "{salt}:")
    # — NEVER Python hash(), which is randomized per process
    h = portable_hash64(F.col(key_col).cast("string"), salt=salt)
    return df.withColumn("_h", h).orderBy("_h").limit(int(k)).drop("_h")


def split_leakage_report(
    df: DataFrame, group_col: str = "host", split_col: str = "split"
) -> DataFrame:
    """Eval-hygiene audit for hash_split outputs: GROUPS that span more
    than one split. A held-out set only measures generalization if its
    content is independent of training — but web corpora correlate
    heavily WITHIN a site (templates, topics, near-dups), so a domain
    with pages in both train and test leaks. Key ``df`` by url and this
    report quantifies the leak; key the SPLIT by the group instead
    (hash_split(key_col=domain)) and the report comes back empty — the
    fix it exists to motivate. Use attach_registrable_domain for the
    group at web scale.

    Returns one row per spanning group: (group, n_splits, splits
    — comma-joined sorted split names — and n_rows). Two map-side-
    combinable groupBys; the second runs over one row per
    (group, split) — tiny at any scale."""
    per = df.groupBy(group_col, split_col).agg(F.count(F.lit(1)).alias("_n"))
    return (
        per.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_splits"),
            F.array_join(
                F.array_sort(F.collect_list(split_col)), ","
            ).alias("splits"),
            F.sum("_n").cast("long").alias("n_rows"),
        )
        .filter(F.col("n_splits") > 1)
    )
