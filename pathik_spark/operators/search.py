"""Full-corpus lexical retrieval: inverted postings, BM25 top-k, and
TF-IDF keyword extraction.

Why a crawl engine needs this: retrieval over the crawled corpus is the
workhorse behind (a) retrieval-based decontamination (find the corpus
documents most similar to an eval question, not just exact n-gram hits
— complements operators/decontaminate.py), (b) "quality by similarity
to a trusted reference" selection (the GPT-3/PaLM recipe scores web
pages against Wikipedia-like positives; BM25 against a reference query
set is the lexical form), and (c) plain corpus analytics ("show me what
we crawled about X"). The reference engine stores pages for exactly
this kind of downstream consumption; here the index IS a DataFrame.

Scale shape (the 100 TB story):
- The only corpus-wide shuffles are the two index-build aggregations,
  both keyed by the table's own natural keys: groupBy (doc_id, tok)
  for term frequencies and groupBy doc_id for document lengths. Both
  are map-side combined (partial aggregation) — the shuffle carries one
  row per distinct (doc, term), not one per token occurrence.
- The query side is TINY (a handful of strings). Query terms broadcast
  and semi-join the postings BEFORE anything else, so document
  frequencies, length joins, and scoring all run over the pruned
  candidate set, never the full index.
- Per-query top-k uses the same two-phase salted window as the
  politeness scheduler (operators/scheduler.py): with ``n_salts > 0``
  a common query term can hit millions of candidate docs without
  funnelling them through one window partition.

Cross-engine exactness: BM25 is a sum of per-term doubles, and double
summation is not associative — so per-(term, doc) weights are rounded
to integer MICRO units (round(w * 1e6) as BIGINT) before the per-doc
sum, the device operators/lm.py uses for log-probs. Integer sums are
associative, so the final score is bit-identical regardless of
partitioning or engine; the DuckDB oracle (`bm25_topk` in
entry_queries.py) states the same formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathik_spark.operators.lm import corpus_tokens

_MICRO = 1_000_000


def _tf_dl(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(term-frequency table (doc_id, tok, tf), doc-length table
    (doc_id, dl)) — the two index-build aggregations."""
    toks = corpus_tokens(docs, text_col=text_col, id_col=id_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("long").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    return tf, dl


def bm25_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The inverted index as a DataFrame: (tok, doc_id, tf, dl).

    tf = occurrences of tok in doc, dl = total tokens in doc (whitespace
    tokens of the normalized text — the corpus-wide convention from
    operators/lm.corpus_tokens; empty docs index nothing).
    """
    tf, dl = _tf_dl(docs, text_col=text_col, id_col=id_col)
    return tf.join(dl, "doc_id").select("tok", "doc_id", "tf", "dl")


def query_terms(queries: DataFrame, query_col: str = "query", id_col: str = "query_id") -> DataFrame:
    """(query_id, tok): DISTINCT whitespace tokens of each normalized
    query string (repeated query terms score once — the set semantics
    most BM25 implementations use for short queries)."""
    return corpus_tokens(
        queries.select(F.col(id_col).alias("doc_id"), F.col(query_col).alias("text"))
    ).select(F.col("doc_id").alias("query_id"), "tok").distinct()


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_salts: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson/Lucene form).

    idf(t)     = ln((N - df + 0.5) / (df + 0.5) + 1)   [always > 0]
    w(t, d)    = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d) = sum over distinct query terms, in integer micro units.

    N and avgdl are over INDEXED docs (dl > 0): empty documents can
    never match, so they are outside the collection by construction.

    Returns (query_id, doc_id, score, rnk), rnk 1..k per query, ties
    broken by doc_id ascending; score rounded to 6 decimals.

    ``n_salts > 0`` switches the per-query window to the two-phase
    salted top-k (phase 1 within (query_id, salt-of-doc_id) keeps ≤ k
    per salt; phase 2 ranks the ≤ n_salts*k survivors) — use at scale,
    where one frequent term can put millions of docs under one query.
    """
    tf, dl = _tf_dl(docs, text_col=text_col, id_col=id_col)
    qt = query_terms(queries)

    # prune FIRST: only postings for query terms survive past the scan
    qtoks = qt.select("tok").distinct()
    cand = tf.join(F.broadcast(qtoks), "tok").join(dl, "doc_id")

    # df over the full corpus (tf has one row per (doc, tok))
    dfreq = cand.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot_dl"),
    )

    scored = (
        cand.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("tot_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "w_micro",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
                * F.lit(_MICRO)
            ).cast("long"),
        )
        .join(F.broadcast(qt), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w_micro").alias("s_micro"))
    )

    order = [F.col("s_micro").desc(), F.col("doc_id").asc()]
    if n_salts > 0:
        # hash-based salt: type-agnostic (string url keys must not
        # degenerate into one NULL salt via an implicit numeric cast)
        from pathik_spark.operators.dedup import portable_hash64

        salt = F.pmod(
            portable_hash64(F.col("doc_id").cast("string")), F.lit(n_salts)
        )
        local = Window.partitionBy("query_id", salt).orderBy(*order)
        scored = (
            scored.withColumn("_lr", F.row_number().over(local))
            .filter(F.col("_lr") <= k)
            .drop("_lr")
        )
    win = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("s_micro") / F.lit(float(_MICRO)), 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    n_terms: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the ``n_terms`` highest-TF-IDF
    terms of each doc — (doc_id, tok, tfidf, rnk).

    tfidf = (tf / dl) * ln(N / df) in micro units (same exactness
    device as bm25_topk). The per-doc window partitions on doc_id —
    each partition is one document's distinct terms, inherently small,
    so no salting is needed here.
    """
    tf, dl = _tf_dl(docs, text_col=text_col, id_col=id_col)
    post = tf.join(dl, "doc_id")
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    n_docs = dl.agg(F.count("*").cast("long").alias("n_docs"))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("t_micro").desc(), F.col("tok").asc()
    )
    return (
        post.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "t_micro",
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n_docs") / F.col("df"))
                * F.lit(_MICRO)
            ).cast("long"),
        )
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= n_terms)
        .select(
            "doc_id",
            "tok",
            F.round(F.col("t_micro") / F.lit(float(_MICRO)), 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
