"""Line-level corpus deduplication and C4-style line cleaning.

Two classic web-text cleaning passes that operate BELOW document
granularity (document-level dedup is operators/dedup.py):

- ``duplicate_lines`` / ``line_dedup``: CCNet-style boilerplate
  removal. Web pages share nav/footer/cookie-banner lines verbatim
  across millions of documents; hashing every line and removing those
  whose corpus-wide occurrence count exceeds a threshold strips the
  boilerplate while leaving body text alone (Wenzek et al., CCNet,
  dedups on paragraph hashes the same way).

  Scale shape: one shuffle — the groupBy on the 60-bit line hash — and
  the heavy-hitter set it produces (count > threshold) is a tiny
  fraction of distinct lines (boilerplate is by definition rare as a
  fraction of distinct strings, massive as a fraction of occurrences),
  so the removal join is a left-anti against a SMALL relation: AQE
  plans it as a broadcast anti-join at any realistic threshold. The
  per-document reassembly groups by doc_id, which is the table's
  natural key — at 100 TB both sides of that shuffle are the same
  partitioning the documents table already has.

- ``c4_clean``: the line + document heuristics from the C4 dataset
  (Raffel et al., 2020, §2.2): keep only lines that end in terminal
  punctuation and have >= 5 words; drop lines mentioning javascript or
  containing cookie/boilerplate markers; drop whole documents that are
  too short after cleaning, contain "lorem ipsum", or contain a curly
  brace (code leak). Pure higher-order-function expressions over the
  split line array — no shuffle, no Python, fan-in happens inside the
  scan task that read the document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.operators.dedup import normalized_text, portable_hash64


def _line_key(line_col):
    """60-bit portable hash of the normalized line (reproducible in
    DuckDB — see operators/dedup.portable_hash64)."""
    return portable_hash64(normalized_text(line_col))


def corpus_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *extra_cols, line_no, line, line_key): one row per
    line, document order preserved via line_no. Blank lines carry
    through (they are dropped from counting by callers, kept for
    faithful reassembly). ``extra_cols`` carries grouping keys (e.g.
    the host column for the per-site variant) through the explode."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).withColumn("line_key", _line_key(F.col("line")))


def _reassemble(marked: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Rebuild documents from a lines relation carrying a `_heavy` flag
    (null = keep): kept lines rejoin with newlines in original order;
    n_lines/n_kept count total vs surviving. Shared by the corpus-wide
    and per-site dedup so their reassembly semantics cannot diverge."""
    keep = F.col("_heavy").isNull()
    return (
        marked.groupBy("doc_id", *group_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("line_no", "line")))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text"),
            F.count("*").alias("n_lines"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        )
        .select("doc_id", *group_cols, "text", "n_lines", "n_kept")
    )


def duplicate_lines(
    docs: DataFrame,
    max_occurrences: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The boilerplate table: (line_key, n_occurrences, sample_line)
    for every non-blank line occurring more than ``max_occurrences``
    times corpus-wide. sample_line = lexicographic min of the raw
    forms (deterministic)."""
    lines = corpus_lines(docs, text_col, id_col).filter(
        F.trim(F.col("line")) != ""
    )
    return (
        lines.groupBy("line_key")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("line").alias("sample_line"),
        )
        .filter(F.col("n_occurrences") > max_occurrences)
    )


def line_dedup(
    docs: DataFrame,
    max_occurrences: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every copy of corpus-duplicate lines (CCNet boilerplate
    removal): lines whose occurrence count exceeds ``max_occurrences``
    vanish from ALL documents; everything else keeps its position.

    Returns (doc_id, text, n_lines, n_kept): the reassembled document
    (kept lines joined with newlines, original order), the original
    line count, and the kept count. Documents whose every line was
    boilerplate survive with text='' and n_kept=0 — dropping rows is
    the caller's policy decision, not the operator's.
    """
    lines = corpus_lines(docs, text_col, id_col)
    heavy = (
        duplicate_lines(docs, max_occurrences, text_col, id_col)
        .select("line_key")
        .withColumn("_heavy", F.lit(True))
    )
    # broadcast LEFT join (not anti) so total and kept counts fuse into
    # ONE groupBy on doc_id: one corpus shuffle instead of two, one
    # scan-side pass instead of totals + rebuilt
    marked = lines.join(F.broadcast(heavy), "line_key", "left")
    return _reassemble(marked)


def host_template_lines(
    docs: DataFrame,
    group_col: str = "source",
    min_docs: int = 2,
    max_doc_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-site template table: (grp, line_key, n_docs, group_docs,
    sample_line) for lines present in MORE than ``max_doc_pct`` percent
    of a group's documents (and in at least ``min_docs`` of them).

    This is the site-template complement to the corpus-wide
    ``duplicate_lines``: a host's nav/sidebar/footer lines repeat on
    every page of THAT site while staying rare corpus-wide, so a global
    occurrence threshold scaled to corpus size never catches them
    (RefinedWeb/FineWeb run exactly this pass per dump/site). The
    heaviness test is pure integer arithmetic
    (n_docs * 100 > max_doc_pct * group_docs) so the DuckDB oracle
    agrees exactly at any boundary.

    Scale shape: counting keys on (grp, line_key) — hash-uniform even
    when one host dominates the corpus, because a host's DISTINCT lines
    spread over the key space regardless of its page count. The
    membership dedup (a line counted once per document) rides the same
    shuffle. Group totals are one tiny aggregate, broadcast."""
    lines = corpus_lines(
        docs.withColumn("grp", F.col(group_col)), text_col, id_col, extra_cols=("grp",)
    )
    per_doc = (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("grp", "line_key")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("line").alias("sample_line"),
        )
    )
    totals = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("group_docs")
    )
    return (
        per_doc.join(F.broadcast(totals), "grp")
        .filter(
            (F.col("n_docs") >= int(min_docs))
            & (F.col("n_docs") * 100 > int(max_doc_pct) * F.col("group_docs"))
        )
        .select("grp", "line_key", "n_docs", "group_docs", "sample_line")
    )


def host_line_dedup(
    docs: DataFrame,
    group_col: str = "source",
    min_docs: int = 2,
    max_doc_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove each site's template lines from that site's documents
    (lines in > ``max_doc_pct``% of the group's docs); identical lines
    on OTHER sites are untouched. Returns (doc_id, grp, text, n_lines,
    n_kept), reassembled in original order — same contract as
    ``line_dedup``, plus the group key.

    The removal join keys on (grp, line_key): the template set is tiny
    per group but too large corpus-wide to broadcast at 10^10 docs, so
    this is a shuffle join on a hash-uniform composite key; AQE's
    skew-split covers a mega-host's line volume."""
    lines = corpus_lines(
        docs.withColumn("grp", F.col(group_col)), text_col, id_col, extra_cols=("grp",)
    )
    heavy = (
        host_template_lines(docs, group_col, min_docs, max_doc_pct, text_col, id_col)
        .select("grp", "line_key")
        .withColumn("_heavy", F.lit(True))
    )
    marked = lines.join(heavy, ["grp", "line_key"], "left")
    return _reassemble(marked, group_cols=("grp",))


# --- C4-style heuristic cleaning ---------------------------------------------

# C4 §2.2 constants (Raffel et al. 2020) — shared verbatim with the
# DuckDB oracle in entry_queries (one constant table, two renderers).
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 3
C4_TERMINAL = (".", "!", "?", '"')
C4_LINE_BLOCKLIST = ("javascript", "cookie policy")
C4_DOC_BLOCKLIST = ("lorem ipsum", "{")


def _c4_line_keep(line):
    """Line predicate: terminal punctuation, >= 5 words, no blocklist
    marker (case-insensitive)."""
    t = F.trim(line)
    lowered = F.lower(t)
    ends_ok = F.substring(t, -1, 1).isin(*C4_TERMINAL)
    words_ok = F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS_PER_LINE
    block = None
    for marker in C4_LINE_BLOCKLIST:
        hit = lowered.contains(marker)
        block = hit if block is None else (block | hit)
    return ends_ok & words_ok & ~block


def c4_clean(
    docs: DataFrame,
    min_lines: int = C4_MIN_LINES,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning: per-line filter + document-level gates, entirely
    scan-local expressions (filter/transform over the split array).
    ``passthrough`` columns ride along unchanged (e.g. a stream's
    event-time column).

    Returns (doc_id, text, n_lines_kept, keep) where text is the
    cleaned document and keep is the document-level verdict: at least
    ``min_lines`` surviving lines AND no doc-blocklist marker anywhere
    in the ORIGINAL text (C4 drops on the raw page, before the line
    pass). Rows are returned for every input doc — filtering on keep
    is the caller's one-liner.
    """
    raw_lower = F.lower(F.col(text_col))
    doc_blocked = None
    for marker in C4_DOC_BLOCKLIST:
        hit = raw_lower.contains(marker)
        doc_blocked = hit if doc_blocked is None else (doc_blocked | hit)
    # NB: F.transform(arr, F.trim) would bind trim's 2-arg (col, trimstr)
    # overload with the element index as trimstr — one-arg lambda required
    kept_lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)), _c4_line_keep
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept_lines, "\n").alias("text"),
        F.size(kept_lines).cast("long").alias("n_lines_kept"),
        (
            (F.size(kept_lines) >= F.lit(min_lines)) & ~doc_blocked
        ).alias("keep"),
        *[F.col(c) for c in passthrough],
    )


# Paragraph numbers pack with doc ids into one orderable BIGINT for the
# first-occurrence winner rule (doc_id * PARA_PACK + para_no) — exact
# and portable to the SQL oracle, unlike a struct min. Bounds both
# factors: ids up to ~2^43, documents up to 2^20 paragraphs.
PARA_PACK = 1 << 20


def corpus_paragraphs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, para_no, para, para_key): one row per non-blank
    paragraph (runs of blank lines separate paragraphs), document
    order via para_no over the ORIGINAL split so positions are stable
    whether or not neighbors were blank."""
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\n[ \t]*\n+")).alias(
            "para_no", "para"
        ),
    ).filter(~F.col("para").rlike(r"^\s*$"))  # trim() is space-only
    return exploded.withColumn("para_key", _line_key(F.col("para")))


def paragraph_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact paragraph-level dedup, keep-first (RefinedWeb §3.3 /
    CCNet family): every repeated paragraph survives ONLY at its first
    corpus occurrence — first by (doc_id, para_no) — and vanishes from
    every later document. Complements line_dedup (which removes ALL
    copies of heavy boilerplate): here the first copy stays, so rare
    cross-posted content is not lost, at the cost of an order-dependent
    winner (the packed id makes it deterministic on any cluster).

    Returns (doc_id, text, n_paras, n_kept); kept paragraphs rejoin
    with a blank line. Docs whose every paragraph was a later
    duplicate survive with text='' (dropping is caller policy, as in
    line_dedup).

    Scale shape: one map-side-combinable MIN groupBy on the 60-bit
    paragraph hash, one hash-keyed join back (AQE handles the
    boilerplate-key skew), one doc_id groupBy for reassembly — no
    windows, no all-pairs.

    ``id_col`` must be integral, < 2^43, and stable across runs; at
    web scale use the ingest sequence, not a 64-bit content hash.
    """
    paras = corpus_paragraphs(docs, text_col, id_col)
    packed = paras.withColumn(
        "_pos", F.col("doc_id") * F.lit(PARA_PACK) + F.col("para_no")
    )
    winners = packed.groupBy("para_key").agg(F.min("_pos").alias("_win"))
    marked = packed.join(winners, "para_key").withColumn(
        "_heavy", F.when(F.col("_pos") == F.col("_win"), None).otherwise(True)
    )
    keep = F.col("_heavy").isNull()
    rebuilt = (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("para_no", "para")))
                    ),
                    lambda s: s["para"],
                ),
                "\n\n",
            ).alias("text"),
            F.count("*").alias("n_paras"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        )
    )
    # docs with zero non-blank paragraphs still get a row
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )
