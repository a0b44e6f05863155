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
from pyspark.sql import types as T

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
    # Staged projections, not one nested expression: higher-order
    # lambdas are interpreted without common-subexpression elimination,
    # so an array argument that is itself an expensive expression (regex
    # normalize + split) would be RE-EVALUATED per element — O(L^2)
    # regex work per doc. Materializing each array as an attribute in
    # its own projection makes every lambda input an O(1) column
    # reference (and SPARK-36718 keeps CollapseProject from re-inlining
    # multiply-referenced non-cheap expressions). Measured: 33s -> <1s
    # on 5k docs.
    text = F.col(text_col)
    norm = normalized_text(text)
    staged = docs.select(
        F.col(id_col),
        norm.alias("_norm"),
        F.split(text, "\n").alias("_rawlines"),
    )
    toks = F.when(
        F.col("_norm") == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.col("_norm"), " "))
    lines = F.filter(
        F.transform(F.col("_rawlines"), lambda x: F.trim(x)), lambda x: x != ""
    )
    staged = staged.select(
        F.col(id_col), toks.alias("_toks"), lines.alias("_lines")
    )
    n_tokens = F.size(F.col("_toks"))
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tokens - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_toks"), i),
                F.element_at(F.col("_toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select(
        F.col(id_col),
        F.col("_toks"),
        F.col("_lines"),
        F.sort_array(bigrams).alias("_sbg"),
    )

    n_tokens = F.size(F.col("_toks"))
    n_lines = F.size(F.col("_lines"))
    n_bigrams = F.size(F.col("_sbg"))
    dup_line = _frac(n_lines - F.size(F.array_distinct(F.col("_lines"))), n_lines)
    dup_token = _frac(n_tokens - F.size(F.array_distinct(F.col("_toks"))), n_tokens)
    top_bigram = _frac(_max_run(F.col("_sbg")), n_bigrams)

    out = staged.select(
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


# Gopher n-gram repetition thresholds (Rae et al. 2021, Table A1):
# max char-fraction of the most frequent {2,3,4}-gram, and max
# char-fraction covered by duplicate {5..10}-gram instances.
TOP_NGRAM_CHAR_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_CHAR_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _ngrams(toks_col, n: int):
    """Space-joined n-grams of a token array column (empty when the doc
    has fewer than n tokens). The joined string's length equals the
    char span the n-gram covers in the normalized text."""
    n_tokens = F.size(toks_col)
    return F.when(
        n_tokens >= n,
        F.transform(
            F.sequence(F.lit(1), n_tokens - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks_col, i + F.lit(k)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_stats(sorted_arr):
    """(best, dup) over a SORTED n-gram array in one aggregate pass:
    best = max over grams of count * char-length (the top gram's char
    mass); dup = summed char-length of every instance beyond a gram's
    first (duplicate char mass, overlaps counted per instance)."""
    # best/dup are LONG: a maximally repetitive huge document's char
    # mass (count * gram length) clears 2^31, and an int wrap would turn
    # the spammiest fraction negative — passing the very filter it
    # should trip (the DuckDB twin's COUNT/SUM are already BIGINT).
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, x):
        cnt = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["cnt"] + F.lit(1)
        ).otherwise(F.lit(1).cast("long"))
        glen = F.length(x).cast("long")
        dup = F.when(cnt > 1, acc["dup"] + glen).otherwise(acc["dup"])
        best = F.greatest(acc["best"], cnt * glen)
        return F.struct(
            x.alias("prev"), cnt.alias("cnt"), best.alias("best"), dup.alias("dup")
        )

    return F.aggregate(
        sorted_arr,
        acc0,
        step,
        lambda a: F.struct(a["best"].alias("best"), a["dup"].alias("dup")),
    )


def ngram_repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The rest of Gopher's repetition table (repetition_signals covers
    lines/tokens/top-bigram-count): per document, the char-fraction of
    the most frequent {2,3,4}-gram and the char-fraction covered by
    duplicate {5..10}-gram instances, plus the conjunctive ``keep``.

    Fractions are over the normalized text's char length; dup coverage
    counts each duplicate instance's full span (overlapping instances
    counted per instance, capped at 1.0) — a deterministic rule both
    dialects state identically, matching the DataTrove-style
    approximation rather than exact position masking.

    Scale shape: scan-local like repetition_signals — the 9 sorted
    n-gram arrays and their single-pass aggregates are per-document
    expression work with NO shuffle and NO Python. The staged
    projections keep every higher-order-function input an O(1)
    attribute reference (see the SPARK-36718 note above)."""
    text = F.col(text_col)
    norm = normalized_text(text)
    staged = docs.select(F.col(id_col), norm.alias("_norm"))
    toks = F.when(
        F.col("_norm") == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.col("_norm"), " "))
    staged = staged.select(
        F.col(id_col),
        F.length(F.col("_norm")).alias("_nchars"),
        toks.alias("_toks"),
    )
    ns = list(TOP_NGRAM_CHAR_MAX) + list(DUP_NGRAM_CHAR_MAX)
    staged = staged.select(
        F.col(id_col),
        F.col("_nchars"),
        F.size(F.col("_toks")).alias("_ntoks"),
        *[
            F.sort_array(_ngrams(F.col("_toks"), n)).alias(f"_g{n}")
            for n in ns
        ],
    )
    staged = staged.select(
        F.col(id_col),
        F.col("_nchars"),
        F.col("_ntoks"),
        *[_gram_stats(F.col(f"_g{n}")).alias(f"_s{n}") for n in ns],
    )
    nchars = F.col("_nchars")
    cols = [F.col(id_col), F.col("_ntoks").alias("n_tokens")]
    for n in TOP_NGRAM_CHAR_MAX:
        cols.append(
            _frac(F.col(f"_s{n}")["best"], nchars).alias(f"top_{n}gram_char_frac")
        )
    for n in DUP_NGRAM_CHAR_MAX:
        cols.append(
            F.least(_frac(F.col(f"_s{n}")["dup"], nchars), F.lit(1.0)).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    out = staged.select(*cols)
    keep = F.col("n_tokens") >= MIN_TOKENS
    for n, thr in TOP_NGRAM_CHAR_MAX.items():
        keep = keep & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in DUP_NGRAM_CHAR_MAX.items():
        keep = keep & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return out.withColumn("keep", keep)


# Gopher document-rule thresholds (Rae et al. 2021, Table A1) — the
# rules NOT already covered by repetition_signals (repetition family)
# or quality_score (soft score): hard per-document structural gates.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1  # '#' chars + '...' runs, per word
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_DISTINCT = 2


def gopher_rules(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher hard document filters (Rae et al. 2021, Table A1) as
    one scan-local pass: word-count bounds, mean-word-length band,
    symbol-to-word ratio (hash marks + ellipsis runs), bullet-prefixed
    and ellipsis-terminated line fractions, alphabetic-word fraction,
    and the distinct-stop-word floor. Returns every signal plus the
    composed ``keep`` verdict, one row per document.

    Like repetition_signals, everything is per-document array/string
    expression work — no shuffle, no UDF, no groupBy: at 100 TB each
    document's verdict computes inside the scan task that read it
    (whole-stage codegen). Ratios are rounded to 6 dp and ``keep`` is
    derived from the ROUNDED values so the DuckDB twin agrees exactly.

    Conventions (shared with the oracle): words are single-space tokens
    of the normalized text (empty doc -> 0 words, the report.py rule);
    line fractions are over NON-BLANK raw lines; '...' runs count
    non-overlapping via replace-arithmetic in both dialects."""
    text = F.col(text_col)
    norm = normalized_text(text)
    # staged projections (the SPARK-36718 discipline documented at
    # repetition_signals): the _words/_lines arrays become attributes
    # BEFORE any higher-order function consumes them — a HOF argument
    # that is itself regex-normalize+split would be re-evaluated per
    # element (O(L^2) regex work per doc), and the scalar signals would
    # each re-normalize the text besides.
    staged = documents.select(
        F.col(id_col).alias("doc_id"),
        text.alias("_text"),
        norm.alias("_norm"),
    )
    staged = staged.select(
        "doc_id",
        "_text",
        "_norm",
        F.when(F.col("_norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split(F.col("_norm"), " "))
        .alias("_words"),
        F.filter(
            F.split(F.col("_text"), "\n"), lambda l: F.trim(l) != ""
        ).alias("_lines"),
    )
    words = F.col("_words")
    lines = F.col("_lines")
    rawtext = F.col("_text")
    n_words = F.size(words)
    # sum of word lengths = len(norm) - (n_words - 1) separators
    sum_wlen = F.when(n_words == 0, F.lit(0)).otherwise(
        F.length(F.col("_norm")) - (n_words - F.lit(1))
    )
    mean_wlen = sum_wlen.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    n_hash = F.length(rawtext) - F.length(F.replace(rawtext, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(rawtext) - F.length(F.replace(rawtext, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / F.greatest(
        n_words, F.lit(1)
    ).cast("double")
    n_lines = F.size(lines)
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
        )
    ).cast("double") / F.greatest(n_lines, F.lit(1)).cast("double")
    ellipsis_frac = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    ).cast("double") / F.greatest(n_lines, F.lit(1)).cast("double")
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]),
        )
    )
    out = staged.select(
        F.col("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stop_distinct"),
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WLEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WLEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("n_stop_distinct") >= GOPHER_MIN_STOP_DISTINCT)
    )
    return out.withColumn("keep", keep)


def clean_corpus(
    documents: DataFrame,
    pairs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    repetition_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed training-data cleaning decision, one row per doc:
    language gate AND quality-score gate AND Gopher repetition gate AND
    near-dup canonical gate (only the cluster minimum survives).

    This is the pipeline a 100 TB pretraining corpus actually runs —
    each gate is per-document except the dedup labeling, so the plan is
    scan-local column work plus the one component labeling join; the
    gates evaluate in a single pass over the scan, not four.

    ``pairs``: near-dup edges (doc_a, doc_b) from any of the pair
    generators (MinHash-LSH, SimHash, embedding cosine).
    ``repetition_docs``: optional variant of ``documents`` to feed the
    repetition signals (e.g. with synthesized line breaks) when the raw
    text has no newlines; defaults to ``documents``.
    """
    from pathik_spark.functions.text import lang_id, quality_score
    from pathik_spark.operators.dedup import dedup_clusters

    text = F.col(text_col)
    per_doc = documents.select(
        F.col(id_col).alias("doc_id"),
        lang_id(text).alias("lang_guess"),
        quality_score(text).alias("quality"),
    )
    rep = repetition_signals(
        repetition_docs if repetition_docs is not None else documents,
        text_col=text_col,
        id_col=id_col,
    ).select(F.col(id_col).alias("doc_id"), F.col("keep").alias("rep_keep"))
    clusters = dedup_clusters(documents, pairs, id_col=id_col)
    return (
        per_doc.join(rep, "doc_id")
        .join(clusters, "doc_id")
        .select(
            "doc_id",
            "lang_guess",
            "quality",
            "rep_keep",
            "cluster_id",
            "cluster_size",
            "is_canonical",
            (
                F.col("lang_guess").isin(*langs)
                & (F.col("quality") >= F.lit(min_quality))
                & F.col("rep_keep")
                & F.col("is_canonical")
            ).alias("keep"),
        )
    )


def host_quality_profile(
    docs: DataFrame,
    group_col: str = "host",
    text_col: str = "text",
    min_docs: int = 3,
    min_mean_quality: float = 0.5,
) -> DataFrame:
    """Domain-level quality filtering (the FineWeb/RefinedWeb move): a
    host whose AVERAGE document quality is low is a content farm — drop
    the whole domain instead of adjudicating its pages one by one.

    One map-side-combined groupBy over the corpus (shuffle carries one
    row per host). Returns (group_col, n_docs, mean_quality, keep_host):
    hosts below ``min_docs`` are kept (too little evidence to condemn a
    domain); otherwise keep iff mean >= ``min_mean_quality``.

    quality_score is already rounded to 6 dp, so summing it in integer
    MICRO units makes the mean partitioning/engine-exact (the lm.py
    device) — the DuckDB oracle (`host_quality`) relies on it.
    """
    from pathik_spark.functions.text import quality_score

    micro = F.round(quality_score(F.col(text_col)) * 1_000_000).cast("long")
    agg = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(micro).alias("_qsum"),
    )
    mean_q = F.round(F.col("_qsum") / (F.col("n_docs") * F.lit(1_000_000.0)), 6)
    return agg.select(
        group_col,
        "n_docs",
        mean_q.alias("mean_quality"),
        (
            (F.col("n_docs") < min_docs) | (mean_q >= F.lit(min_mean_quality))
        ).alias("keep_host"),
    )


def filter_low_quality_hosts(docs: DataFrame, profile: DataFrame, group_col: str = "host") -> DataFrame:
    """Drop every document of a condemned host: BROADCAST anti-join of
    the (tiny) bad-host list — the corpus never shuffles."""
    bad = profile.filter(~F.col("keep_host")).select(group_col)
    return docs.join(F.broadcast(bad), group_col, "left_anti")


# Soft-404 phrase markers (lowercase). A real error page states its
# failure up front, so matching is restricted to the HEAD of the
# extracted text — a long article that merely mentions "page not found"
# is not flagged.
# deliberately narrow: each phrase names the ERROR itself. Broader
# phrases ("no longer available") false-positive on legitimate ledes
# ("the service is no longer available in Europe...") and are excluded.
SOFT404_MARKERS = (
    "page not found",
    "404 not found",
    "error 404",
    "page cannot be found",
    "page does not exist",
)
SOFT404_HEAD_CHARS = 400
SOFT404_TINY_CHARS = 500


def soft404_signals(
    pages: DataFrame,
    text_col: str = "text",
    head_chars: int = SOFT404_HEAD_CHARS,
    tiny_chars: int = SOFT404_TINY_CHARS,
) -> DataFrame:
    """Soft-404 detection: pages served with HTTP 200 whose CONTENT is
    an error page — a well-known crawl-corpus pollutant (the classic
    treatment is Bar-Yossef et al., "Sic Transit Gloria Telae", WWW'04;
    this is the static content-heuristic arm, no probe fetches).

    Scan-local expressions only: ``has_marker`` = any error phrase in
    the first ``head_chars`` of the text (lowercased), ``tiny`` = text
    shorter than ``tiny_chars``, ``is_soft404`` = marker-in-head (the
    head restriction is the false-positive guard; tiny rides along as
    an analyst signal, not a gate). Adds the three columns; no shuffle.
    """
    head = F.lower(F.substring(F.col(text_col), 1, head_chars))
    marker = None
    for m in SOFT404_MARKERS:
        cond = head.contains(m)
        marker = cond if marker is None else (marker | cond)
    return pages.select(
        "*",
        marker.cast("int").alias("has_marker"),
        (F.length(F.col(text_col)) < tiny_chars).cast("int").alias("tiny"),
        marker.cast("int").alias("is_soft404"),
    )


def filter_soft404s(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop soft-404 pages (scan-local filter, no shuffle)."""
    out = soft404_signals(pages, text_col=text_col)
    return out.filter(F.col("is_soft404") == 0).drop(
        "has_marker", "tiny", "is_soft404"
    )


COMPRESSION_LEVEL = 6  # fixed: the ratio is part of the data contract
MIN_COMPRESSIBLE_BYTES = 64  # below this the zlib header dominates


def compression_signals(
    docs: DataFrame,
    max_ratio: float = 0.98,
    min_ratio: float = 0.30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Compression-ratio quality signal (the RedPajama-v2 /
    DataComp-LM family): deflate the UTF-8 text at a FIXED level and
    report compressed/raw sizes. Near-incompressible text (ratio ->
    1.0) is typically already-compressed junk or random strings;
    extremely compressible text (ratio -> 0) is repetition spam that
    n-gram signals can miss when the period is long. ``keep`` is the
    band verdict; tiny docs (< MIN_COMPRESSIBLE_BYTES) keep
    unconditionally — the zlib header noise would dominate their ratio.

    Integer byte counts, fixed zlib level -> deterministic on any
    cluster. One Arrow batch pass (zlib is C-speed; the UDF cost is
    the bytes, not Python). Returns (doc_id, raw_len, compressed_len,
    ratio_micro, keep); ratio_micro = round(1e6 * compressed/raw) —
    integer, hash-stable."""
    import pandas as pd
    from typing import Iterator

    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", src.schema["doc_id"].dataType),
            T.StructField("raw_len", T.LongType()),
            T.StructField("compressed_len", T.LongType()),
        ]
    )

    def _measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raws, comps = [], []
            for t in pdf["_text"]:
                b = (t or "").encode("utf-8")
                raws.append(len(b))
                comps.append(len(zlib.compress(b, COMPRESSION_LEVEL)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "raw_len": raws, "compressed_len": comps}
            )

    sizes = src.mapInPandas(_measure, schema)
    ratio_micro = F.when(
        F.col("raw_len") > 0,
        F.round(F.col("compressed_len") * 1_000_000 / F.col("raw_len")).cast(
            "long"
        ),
    ).otherwise(F.lit(0))
    keep = (F.col("raw_len") < MIN_COMPRESSIBLE_BYTES) | (
        (F.col("ratio_micro") >= int(min_ratio * 1_000_000))
        & (F.col("ratio_micro") <= int(max_ratio * 1_000_000))
    )
    return sizes.withColumn("ratio_micro", ratio_micro).withColumn(
        "keep", keep
    )
