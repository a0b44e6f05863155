"""Large-scale training-data deduplication operators over a documents
table ``(doc_id, text, ...)``.

These extend the crawl engine with the dedup family a 100 TB web-text
pipeline needs (exact, MinHash+LSH, SimHash, n-gram Jaccard); the
URL-seen filter (operators/seen.py) covers URL-level dedup, these cover
*content*-level dedup.

All hot paths are built-in Spark expressions (explode / groupBy / join /
higher-order functions) — no per-row Python. Two hash families:

- ``xxhash64`` (JVM, fastest) — the production default;
- a *portable* md5-based 60-bit hash (``conv(substr(md5(x),1,15),16,10)``)
  that DuckDB can reproduce bit-for-bit — used by the oracle-checked
  queries in __spark_entry__.py so correctness is cross-engine-verified.

Scale notes: token explode multiplies rows by ~doc length — partial
aggregation (map-side min/sum) collapses it back before the shuffle, so
the shuffle carries one row per (doc, hash-slot). LSH banding turns the
quadratic all-pairs problem into an equi-join on (band_id, band_hash);
AQE skew-join handles hot buckets (empty docs, boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def portable_hash64(col, salt: str | int | None = None):
    """60-bit md5-based hash reproducible in DuckDB:
    ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``. ``salt`` may be
    an int (band/permutation indexes) or a str namespace (e.g.
    'ksample', the Gumbel keys) — either way it is f-string-prefixed
    as ``'{salt}:' || x``, which the DuckDB oracles' literal prefixes
    mirror."""
    base = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def normalized_text(col):
    """Deterministic normalization before hashing: lowercase + collapse
    whitespace runs + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: keeps the lowest doc_id per group.
    Returns (doc_id, content_hash, group_size, is_canonical)."""
    hashed = documents.select(
        "doc_id", F.md5(normalized_text(F.col(text_col))).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("group_size", F.count("*").over(w))
        .withColumn("keep_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "content_hash",
            "group_size",
            (F.col("doc_id") == F.col("keep_id")).alias("is_canonical"),
        )
    )


def word_shingles(
    documents: DataFrame, n: int = 3, text_col: str = "text", distinct: bool = True
) -> DataFrame:
    """(doc_id, shingle) — word n-grams, built with higher-order
    functions (no Python): split -> transform over a sequence -> explode.
    ``distinct=False`` keeps multiplicity (the n-gram *multiset*, for
    counting operators like operators/ngrams.py)."""
    toks = documents.select(
        "doc_id", F.split(normalized_text(F.col(text_col)), " ").alias("toks")
    )
    n_sh = F.greatest(F.size("toks") - F.lit(n - 1), F.lit(0))
    # guard: sequence(0, -1) would generate a DESCENDING [0, -1] for docs
    # shorter than n tokens — emit an empty array instead (explode drops it)
    idx = F.when(n_sh >= 1, F.sequence(F.lit(0), n_sh - 1)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(" ", *[F.element_at("toks", (i + j + 1).cast("int")) for j in range(n)]),
            )
        ).alias("shingle"),
    )
    return shingles.distinct() if distinct else shingles


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16, portable: bool = False
) -> DataFrame:
    """(doc_id, h0..h{k-1}): one groupBy with k map-side-combinable mins."""
    if portable:
        hcol = lambda i: portable_hash64(F.col("shingle"), salt=i)
    else:
        hcol = lambda i: F.xxhash64(F.lit(i), F.col("shingle"))
    aggs = [F.min(hcol(i)).alias(f"h{i}") for i in range(num_hashes)]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 16, band_size: int = 2,
    portable: bool = False, compact32: bool = False,
) -> DataFrame:
    """Band the signature, self-join on the band key; returns distinct
    (doc_a, doc_b) with doc_a < doc_b. ``portable=True`` hashes bands
    with the md5-based family so DuckDB can reproduce the candidate set
    bit-for-bit (oracle path); default is xxhash64.

    ``compact32=True`` is the bandwidth-lean shape for the banding
    shuffle (the dedup pipeline's hottest exchange; the round-4 scaling
    decomposition showed 4N wall-time on this path is memory-bandwidth
    bound, so bytes saved are wall-time earned): the band id is FOLDED
    into one 32-bit key, shrinking each band row from
    (doc_id, band_id int, band_hash long) = 20 B to (doc_id, key int)
    = 12 B and the join to a single-int equi-join. A 32-bit (or
    cross-band) key collision can only ADD candidate pairs — never
    drop one (two docs agreeing on a band still agree on its folded
    key) — and the downstream exact-Jaccard verification removes them,
    so verified-pair semantics are unchanged; expected spurious
    candidates ~ (band rows)²/2³³ (a few thousand at 600k docs —
    noise next to the verify join). Both hash families support it:
    xxhash64 folds via the Murmur3 ``hash()`` (production), the
    portable family via HASH60 % 2³¹ so the ``band_pairs_i32`` oracle
    pins the compact shape end-to-end in DuckDB."""
    n_bands = num_hashes // band_size

    def band_cols(b: int):
        return [F.col(f"h{b * band_size + j}") for j in range(band_size)]

    def band_hash(b: int):
        cols = band_cols(b)
        if portable:
            return portable_hash64(F.concat_ws(",", *[c.cast("string") for c in cols]))
        return F.xxhash64(*cols)

    def band_key32(b: int):
        cols = band_cols(b)
        if portable:
            return F.pmod(
                portable_hash64(
                    F.concat_ws(",", *[c.cast("string") for c in cols]),
                    salt=f"band{b}",
                ),
                F.lit(1 << 31),
            ).cast("int")
        return F.hash(F.lit(b), *cols)

    if compact32:
        bands = signatures.select(
            "doc_id",
            F.explode(
                F.array(*[band_key32(b) for b in range(n_bands)])
            ).alias("band_key"),
        )
        left = bands.alias("a")
        right = bands.alias("b")
        return (
            left.join(
                right,
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )

    bands = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_hash(b).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    left = bands.alias("a")
    right = bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
    hashed: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard |A∩B| / (|A|+|B|-|A∩B|) per pair.

    Two physically different plans with identical output values:

    - ``candidates`` given (the LSH verification step — the production
      path): build one shingle *set* per doc (``collect_set``, map-side
      partial aggregation collapses the explode before the shuffle),
      semi-restrict the set table to docs that occur in any candidate
      pair (candidate ids are small by the LSH contract, so this and the
      pair joins broadcast), then two equi-joins + ``array_intersect``.
      The corpus-sized shingle table is never self-joined — profiling at
      600k docs showed the old shingle⋈shingle verify was ~80% of the
      cleaning pipeline's runtime and its string shuffle is the one
      stage that cannot scale to 100 TB.
    - no ``candidates`` (exact all-pairs mode, small inputs): relational
      self-join on the shingle value + group count, as before.

    Parity invariants shared by both paths: only pairs with
    ``doc_a < doc_b`` and ``n_inter >= 1`` are emitted, duplicate
    (doc_id, shingle) rows do not change set semantics on the candidates
    path (``collect_set`` dedups in-agg, so callers may pass
    ``word_shingles(distinct=False)`` and skip that shuffle too), and
    the rounding is identical — the DuckDB oracle (`ngram_jaccard`,
    `minhash_lsh_pairs`) checks values, not plans.

    ``hashed=True`` (candidates path only — the production arm): set
    elements are ``xxhash64(shingle)`` longs instead of the shingle
    strings, shrinking the per-doc set payload ~5x (8 bytes vs ~40) —
    Jaccard over hash-sets equals Jaccard over string-sets except on
    64-bit collisions (P ≈ |doc|²/2⁶⁴ per pair, vanishing). Same
    convention as the portable-vs-xxhash64 hash families elsewhere:
    only the element projection differs, the verified set machinery is
    the same code path the oracles check with exact strings.
    """
    if candidates is not None:
        cands = candidates.select("doc_a", "doc_b").distinct().filter(
            F.col("doc_a") < F.col("doc_b")
        )
        cand_ids = (
            cands.select(F.col("doc_a").alias("doc_id"))
            .union(cands.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        elem = F.xxhash64("shingle") if hashed else F.col("shingle")
        # semi-restrict BEFORE the groupBy: Catalyst does not push a
        # left-semi below a collect_set aggregate, so the post-agg form
        # shuffles one set per CORPUS doc and discards most of them —
        # measured ~570 MB of the dedup pipeline's ~840 MB shuffle at
        # 600k docs. Pre-agg, the restriction is a broadcast semi-join
        # applied in the scan stage (cand_ids is small by the LSH
        # contract) and only candidate docs' shingles reach the shuffle.
        # Same output: the filter is on the grouping key.
        sets = (
            shingles.join(cand_ids, "doc_id", "left_semi")
            .select("doc_id", elem.alias("_e"))
            .groupBy("doc_id")
            .agg(F.collect_set("_e").alias("_sh"))
        )
        out = (
            cands.join(
                sets.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sh_a")),
                "doc_a",
            )
            .join(
                sets.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sh_b")),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("_sh_a", "_sh_b")).alias("n_inter"),
                F.size("_sh_a").alias("n_a"),
                F.size("_sh_b").alias("n_b"),
            )
            .filter(F.col("n_inter") >= 1)
        )
    else:
        sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_inter"))
        )
        out = inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a"
        ).join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
    out = out.withColumn(
        "jaccard",
        F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
        ),
    ).select("doc_a", "doc_b", "n_inter", "jaccard")
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def simhash(documents: DataFrame, text_col: str = "text", portable: bool = False) -> DataFrame:
    """64-bit SimHash (32-bit when portable): per-token hash bits are
    summed ±1 per position; sign gives the fingerprint bit. Pure
    explode + conditional sums (JVM)."""
    n_bits = 32 if portable else 64
    toks = documents.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = portable_hash64(F.col("tok")) if portable else F.xxhash64(F.col("tok"))
    toks = toks.select("doc_id", h.alias("h"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(n_bits)
        ]
    )
    fp = None
    for b in range(n_bits):
        # bit 63 is the sign bit of a signed long: its two's-complement
        # contribution is -(2^63)
        val = -(2 ** 63) if b == 63 else 2 ** b
        term = F.when(F.col(f"b{b}") > 0, F.lit(val).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return bit_sums.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance on SimHash. Scale path: block on
    16-bit quadrants (a pair within distance<=3 shares at least one exact
    quadrant by pigeonhole), join per quadrant, verify exact distance."""
    quads = fingerprints.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("quad"),
    ).select("doc_id", "simhash", "quad.q", "quad.qh")
    a, b = quads.alias("a"), quads.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def connected_components(
    edges: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-dup candidate pairs: the step that
    turns pairwise similarity (LSH / SimHash / embedding pairs) into
    dedup *clusters* so one canonical doc per component survives.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — converges in
    O(log^2 n) rounds (2-3 in practice for shallow dedup graphs), each
    round two shuffles of the CURRENT edge set only. No driver-side
    graph state: the only driver values are per-round convergence
    checksums (2 longs). Per-round ``localCheckpoint`` truncates the
    lineage so the loop's plan does not grow (the Spark-loop pitfall).

    At 100 TB the edge set after LSH banding is sparse (pairs, not
    all-pairs), so each iteration is a pair-table groupBy — the same
    shuffle shape as the banding join that produced it.

    Returns (doc_id, cluster_id) for every node present in ``edges``;
    cluster_id is the component's minimum doc_id (deterministic).
    """
    e = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _canon(df: DataFrame) -> DataFrame:
        # undirected edge as (min, max), self-loops dropped, deduped
        return (
            df.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _large_star(df: DataFrame) -> DataFrame:
        sym = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # direct edges toward the smaller endpoint: (u, v) with v < u
        directed = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = directed.groupBy("u").agg(F.min("v").alias("m"))
        relink = directed.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_link = m.select("u", F.col("m").alias("v"))
        return relink.union(self_link)

    e = _canon(e).localCheckpoint()
    prev = (-1, -1)
    for _ in range(max_iters):
        e = _canon(_small_star(_large_star(e))).localCheckpoint()
        chk = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))), F.lit(0)
            ).alias("s"),
        ).collect()[0]
        cur = (chk["n"], chk["s"])
        if cur == prev:
            break
        prev = cur
    # converged edge set is a star forest in (min, max) canonical form:
    # u is the component-min root, v a member
    members = e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id"))
    roots = e.select(F.col("u").alias("doc_id"), F.col("u").alias("cluster_id"))
    return members.union(roots).groupBy("doc_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def dedup_clusters(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-corpus cluster labeling: every document gets a cluster_id
    (its component min over the near-dup pair graph; itself when
    unpaired), the cluster's size, and an is_canonical flag (the keep
    decision: lowest doc_id in the cluster). The pair side is tiny
    relative to the corpus, so the label join broadcasts when small and
    shuffles on doc_id otherwise — never on the cluster key (skew-free:
    a viral boilerplate cluster stays one label, not one partition)."""
    labels = connected_components(pairs)
    lab = documents.select(F.col(id_col).alias("doc_id")).join(
        labels, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    sizes = lab.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return lab.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


# portable hash as a SQL-expression fragment usable inside higher-order
# lambdas (the column-level portable_hash64 cannot be referenced there)
def _ph_sql(e: str) -> str:
    return f"CAST(conv(substr(md5({e}), 1, 15), 16, 10) AS BIGINT)"


def cdc_chunk_hashes(
    documents: DataFrame,
    window: int = 4,
    avg_chunk: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync boundary device, token
    granularity): a chunk boundary falls AFTER token position e
    whenever the hash of the ``window``-gram ending at e is divisible
    by ``avg_chunk`` — boundaries move WITH the content, so inserting
    one sentence re-chunks only its neighborhood, where fixed-stride
    shingles shift every downstream window. That makes shared-chunk
    counting a fuzzy dedup signal robust to local edits.

    Fully scan-local array expressions (sequence -> filter -> zip_with
    span hashing, portable md5-60bit hash shared with DuckDB) until the
    single posexplode; no shuffle. Returns (doc_id, chunk_idx,
    chunk_hash, n_chunks); empty/whitespace docs produce no rows.
    """
    w, m = int(window), int(avg_chunk)
    gram = _ph_sql(f"array_join(slice(_toks, e - {w} + 1, {w}), ' ')")
    chunk = _ph_sql("array_join(slice(_toks, s, e - s + 1), ' ')")
    prepared = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            normalized_text(F.col(text_col)).alias("_norm"),
        )
        .filter(F.col("_norm") != "")
        .withColumn("_toks", F.split(F.col("_norm"), " "))
        .withColumn("_n", F.size("_toks"))
        .withColumn(
            "_cuts",
            F.expr(
                f"CASE WHEN _n > {w} THEN "
                f"filter(sequence({w}, _n - 1), e -> {gram} % {m} = 0) "
                f"ELSE CAST(array() AS array<int>) END"
            ),
        )
        .withColumn(
            "_starts",
            F.expr("concat(array(1), transform(_cuts, c -> c + 1))"),
        )
        .withColumn("_ends", F.expr("concat(_cuts, array(_n))"))
        .withColumn(
            "_chunks",
            F.expr(f"zip_with(_starts, _ends, (s, e) -> {chunk})"),
        )
    )
    return prepared.select(
        "doc_id",
        F.posexplode("_chunks").alias("chunk_idx", "chunk_hash"),
        F.size("_chunks").alias("n_chunks"),
    ).select("doc_id", "chunk_idx", "chunk_hash", "n_chunks")


def _containment_pairs(
    sets,
    id_col: str,
    key_col: str,
    n_col: str,
    threshold: float,
    max_df: int | None,
    out_a: str,
    out_b: str,
):
    """Shared containment-join core for cdc_near_pairs /
    host_mirror_pairs: optional max_df hot-key drop (broadcast
    anti-join), shared-key equi-join (never all-pairs), containment =
    shared / min(n). ``sets`` must be distinct (id, key, n) rows."""
    if max_df is not None:
        hot = (
            sets.groupBy(key_col)
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > int(max_df))
            .select(key_col)
        )
        sets = sets.join(F.broadcast(hot), key_col, "left_anti")
    a = sets.select(
        F.col(id_col).alias(out_a), key_col, F.col(n_col).alias("_n_a")
    )
    b = sets.select(
        F.col(id_col).alias(out_b), key_col, F.col(n_col).alias("_n_b")
    )
    joined = a.join(b, key_col).filter(F.col(out_a) < F.col(out_b))
    scored = joined.groupBy(out_a, out_b).agg(
        F.count("*").alias("shared"),
        F.min(F.least("_n_a", "_n_b")).alias("_min_n"),
    )
    return scored.filter(
        F.col("shared") >= F.col("_min_n") * F.lit(float(threshold))
    ).select(
        out_a,
        out_b,
        "shared",
        F.round(F.col("shared") / F.col("_min_n"), 6).alias("containment"),
    )


def cdc_near_pairs(
    chunks: DataFrame,
    threshold: float = 0.5,
    max_df: int | None = 50,
) -> DataFrame:
    """Fuzzy near-dup pairs from CDC chunks: candidates share a chunk
    hash (equi-join — never all-pairs, the banding discipline), scored
    by containment = shared distinct chunks / min(n_chunks). ``max_df``
    drops chunk hashes occurring in more than that many documents
    before the join (boilerplate chunks are the skew hazard, exactly
    like hot LSH bands); the dropped mass only lowers recall for
    template text that line/host dedup already targets. Returns
    (doc_a, doc_b, shared, containment) with doc_a < doc_b.
    """
    sets = chunks.select("doc_id", "chunk_hash", "n_chunks").distinct()
    return _containment_pairs(
        sets, "doc_id", "chunk_hash", "n_chunks", threshold, max_df,
        "doc_a", "doc_b",
    )


def host_mirror_pairs(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int | None = 50,
) -> DataFrame:
    """Content-based mirror detection: pairs of hosts serving largely
    IDENTICAL page content — the content twin of the link-based
    rank.host_components signal (a true mirror interlinks little but
    duplicates much, so the two catch different farms).

    Per-host distinct content hashes (md5 of normalized text) ->
    shared-hash equi-join (never all-pairs) -> containment = shared /
    min(distinct pages). ``max_df`` drops content served by more than
    that many hosts first (license banners, parked-domain pages — the
    skew hazard, same discipline as cdc_near_pairs). Returns (host_a,
    host_b, shared, containment) with host_a < host_b.
    """
    sets = (
        docs.select(
            F.col(host_col).alias("host"),
            F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
        )
        .distinct()
    )
    counts = sets.groupBy("host").agg(F.count("*").alias("n_pages"))
    sets = sets.join(counts, "host")
    return _containment_pairs(
        sets, "host", "content_hash", "n_pages", threshold, max_df,
        "host_a", "host_b",
    )
