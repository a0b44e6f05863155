"""User-facing facade: the reference's one-call API over the engine.

Reference surface being re-expressed (NOT ported):
- ``pathik.crawl(urls, output_dir, parallel) -> Dict[url, result]``
  (/root/reference/pathik/crawler.py:395-506; result schema
  pathik/schema.py:43-66 ``PathikFileResult``: html/markdown paths +
  success/error),
- ``pathik.crawl_to_r2(urls, uuid_str, parallel)``
  (pathik/__init__.py:265-297, crawler.py:508-578),
- ``pathik.stream_to_kafka(urls, content_type, topic, session, ...)``
  (pathik/__init__.py:40-208).

Differences, by design: the engine is replay-from-table (the sandbox has
no network), so content comes from a ``pages`` DataFrame/parquet of
(url, warc_ts, html, ...) instead of live fetches, and the reference's
random uuids/wall-clock timestamps are determinized (uuid = f(run_id,
url); file timestamps from warc_ts). ``parallel`` is accepted for API
parity — Spark parallelizes regardless.

The dict-returning facade collect()s: it exists for the reference's
interactive few-to-thousands-of-URLs use case. The 10^10-scale path is
plans.driver.CrawlRun, which never returns rows to the driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathik_spark.config import CrawlConfig
from pathik_spark.kernels.extract import SAVE_CAP
from pathik_spark.operators.fetch import extract_artifacts, fetch_join
from pathik_spark.operators.frontier import prepare_frontier
from pathik_spark.sources import sinks

__all__ = [
    "crawl",
    "crawl_to_r2",
    "stream_to_kafka",
    "prepare_training_corpus",
    "dedup_corpus",
    "search_corpus",
]


def prepare_training_corpus(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    line_max_occurrences: int = 1000,
    dedup_paragraphs: bool = False,
    neardup_threshold: float = 0.8,
    split_weights: dict[str, float] | None = None,
    apply_c4: bool = True,
    drop_soft404: bool = True,
    fix_encoding: bool = False,
    lexicon_gate: bool = False,
    lexicon_terms: tuple[str, ...] | None = None,
    max_lexicon_ratio_micro: int = 20_000,
    lm_reference: DataFrame | None = None,
    min_mean_logp: float | None = None,
    drop_ppl_buckets: tuple[str, ...] | None = None,
    substring_ngram: int | None = None,
    substring_min_count: int = 2,
    host_col: str | None = None,
    min_host_quality: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    lang_mix_alpha: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """One-call cleaning pipeline: raw documents -> training corpus.

    Chains the engine's cleaning operators in the order a production
    webtext pipeline runs them:

    0. soft-404 gate (``drop_soft404``): pages served 200 whose content
       is an error page (head-window phrase match, quality.
       soft404_signals) drop before anything else — scan-local;
    0a. optional lexicon content gate (``lexicon_gate=True``): the
       ratio-form bad-words filter (operators/lexicon.py) drops pages
       whose lexicon-hit density crosses ``max_lexicon_ratio_micro``
       (pass the production list via ``lexicon_terms``; the built-in
       category-marker default otherwise) — scan-local, pushes down;
    0b. optional encoding repair (``fix_encoding=True``): mojibake
       (utf-8 read as cp1252) detected by exact char-shrinkage and
       inverted in place (functions/mojibake.py) — scan-local, only
       flagged rows rewritten;
    1. C4 line/document heuristics (``apply_c4=False`` to skip for
       pre-cleaned text) — rewrites text, drops gated docs;
    2. CCNet line-level boilerplate removal corpus-wide
       (``line_max_occurrences``);
    2a. optional keep-first exact paragraph dedup
       (``dedup_paragraphs=True``, RefinedWeb family): repeated
       paragraphs survive only at their first corpus occurrence; docs
       left with zero paragraphs drop;
    2b. optional exact-substring span removal (Lee et al. ExactSubstr,
       ``substring_ngram`` tokens, >= ``substring_min_count``
       occurrences corpus-wide) — catches verbatim boilerplate that
       crosses line boundaries; note the stripped text is the
       whitespace-normalized reconstruction (lowercased), which the
       downstream gates normalize anyway;
    3. the composed ``clean_corpus`` verdict (language AND quality AND
       Gopher-repetition AND near-dup-canonical; ``pairs`` defaults to
       MinHash-LSH candidates generated from the cleaned text and
       VERIFIED by exact n-gram Jaccard >= ``neardup_threshold`` —
       raw banding candidates over-merge template-heavy corpora);
    4. optional CCNet-style LM gate: when ``lm_reference`` (a trusted
       corpus DataFrame) is given, a unigram LM trained on it scores
       every doc; rows below ``min_mean_logp`` are dropped (annotate-
       only when the threshold is None — the column rides along), and
       when ``drop_ppl_buckets`` is given (e.g. ``("tail",)`` — the
       CCNet recipe) the rank-exact head/middle/tail perplexity cut
       runs per lang_guess and the named buckets are dropped;
    5. deterministic train/val/test ``hash_split`` keyed by doc id.

    Optional stages:
    - ``host_col`` + ``min_host_quality``: FineWeb-style whole-domain
      filtering BEFORE the per-doc gates — hosts whose mean quality is
      below the floor drop wholesale (broadcast anti-join; ``host_col``
      must be a column of ``docs`` and survives onto the output);
    - ``dsir_target`` + ``dsir_k``: DSIR importance resampling as the
      final selection — keep the ``dsir_k`` documents whose hashed
      n-gram distribution best matches the target corpus (deterministic
      Gumbel-top-k), applied after all gates, before the split;
    - ``lang_mix_alpha``: temperature-scaled language rebalance (mC4
      p ∝ n^alpha over ``lang_guess``; alpha=0 is the UniMax limit)
      after all gates, before the split — deterministic hash-lattice
      sampling keyed by doc_id.

    Returns ``(corpus, report)``: the kept rows as (doc_id, text,
    lang_guess, quality, split) and the dataset-card rollup grouped by
    (lang_guess, split). Everything is lazy except nothing — both
    returns are unevaluated plans.
    """
    from pathik_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from pathik_spark.operators.linedup import c4_clean, line_dedup
    from pathik_spark.operators.quality import clean_corpus
    from pathik_spark.operators.report import corpus_report
    from pathik_spark.operators.sampling import hash_split

    keep_cols = ["doc_id", "text"] + ([host_col] if host_col else [])
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *([F.col(host_col)] if host_col else []),
    )
    if host_col and min_host_quality is not None:
        from pathik_spark.operators.quality import (
            filter_low_quality_hosts,
            host_quality_profile,
        )

        profile = host_quality_profile(
            staged, group_col=host_col, min_mean_quality=min_host_quality
        )
        staged = filter_low_quality_hosts(staged, profile, group_col=host_col)
    hosts = staged.select("doc_id", *keep_cols[2:]) if host_col else None
    staged = staged.select("doc_id", "text")
    if drop_soft404:
        from pathik_spark.operators.quality import filter_soft404s

        staged = filter_soft404s(staged)
    if lexicon_gate:
        from pathik_spark.operators.lexicon import (
            DEFAULT_LEXICON,
            filter_by_lexicon,
        )

        staged = filter_by_lexicon(
            staged,
            terms=lexicon_terms or DEFAULT_LEXICON,
            max_ratio_micro=max_lexicon_ratio_micro,
        )
    if fix_encoding:
        # exact inversion of utf-8-read-as-cp1252 damage, applied only
        # to flagged rows (scan-local; see functions/mojibake.py)
        from pathik_spark.functions.mojibake import is_mojibake, repair_mojibake

        staged = staged.withColumn(
            "text",
            F.when(
                is_mojibake(F.col("text")), repair_mojibake(F.col("text"))
            ).otherwise(F.col("text")),
        )
    if apply_c4:
        staged = c4_clean(staged).filter(F.col("keep")).select("doc_id", "text")
    staged = line_dedup(staged, max_occurrences=line_max_occurrences).select(
        "doc_id", "text"
    )
    if dedup_paragraphs:
        from pathik_spark.operators.linedup import paragraph_dedup

        staged = (
            paragraph_dedup(staged)
            .filter(F.col("n_kept") > 0)
            .select("doc_id", "text")
        )
    if substring_ngram is not None:
        from pathik_spark.operators.substring import (
            duplicated_spans,
            strip_duplicated_spans,
        )

        spans = duplicated_spans(
            staged, n=substring_ngram, min_count=substring_min_count
        )
        staged = strip_duplicated_spans(staged, spans).select(
            "doc_id", F.col("clean_text").alias("text")
        )
    if pairs is None:
        # distinct=False: min-agg and collect_set both dedup in-agg, so
        # the explicit 70M-row distinct shuffle buys nothing here
        shingles = word_shingles(staged, distinct=False)
        cands = lsh_candidate_pairs(
            minhash_signatures(shingles), compact32=True
        )
        pairs = jaccard_pairs(
            shingles, cands, threshold=neardup_threshold, hashed=True
        ).select(
            "doc_a", "doc_b"
        )
    verdict = clean_corpus(staged, pairs, langs=langs, min_quality=min_quality)
    kept = staged.join(
        verdict.filter(F.col("keep")).select("doc_id", "lang_guess", "quality"),
        "doc_id",
    )
    out_cols = ["doc_id", "text", "lang_guess", "quality", "split"]
    if lm_reference is not None:
        from pathik_spark.operators.lm import lm_score, train_unigram_lm

        lm = train_unigram_lm(lm_reference)
        kept = kept.join(
            lm_score(kept, lm).select("doc_id", "mean_logp"), "doc_id"
        )
        if min_mean_logp is not None:
            kept = kept.filter(F.col("mean_logp") >= min_mean_logp)
        out_cols.append("mean_logp")
        if drop_ppl_buckets:
            from pathik_spark.operators.lm import perplexity_buckets

            kept = perplexity_buckets(kept, lang_col="lang_guess").filter(
                ~F.col("ppl_bucket").isin(*drop_ppl_buckets)
            )
            out_cols.append("ppl_bucket")
    elif drop_ppl_buckets:
        raise ValueError("drop_ppl_buckets requires lm_reference")
    if lang_mix_alpha is not None:
        from pathik_spark.operators.sampling import temperature_mix

        kept = temperature_mix(
            kept, alpha=lang_mix_alpha, group_col="lang_guess", key_col="doc_id"
        )
    if dsir_target is not None and dsir_k is not None:
        from pathik_spark.operators.dsir import dsir_select

        chosen = dsir_select(kept, dsir_target, k=dsir_k).select("doc_id")
        kept = kept.join(F.broadcast(chosen), "doc_id")
    if hosts is not None:
        kept = kept.join(hosts, "doc_id")
        out_cols.insert(2, host_col)
    corpus = hash_split(
        kept.withColumn("_key", F.col("doc_id").cast("string")),
        split_weights or {"train": 0.98, "val": 0.01, "test": 0.01},
        key_col="_key",
    ).select(*out_cols)
    report = corpus_report(corpus, group_cols=("lang_guess", "split"))
    return corpus, report


def search_corpus(
    docs: DataFrame,
    queries: str | list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 0,
) -> DataFrame:
    """BM25 search over a document table with plain-string queries —
    the one-liner for "show me what we crawled about X".

    Returns (query_id, query, doc_id, score, rnk), top-``k`` per query
    — query_id is positional (1-based), so duplicate query strings stay
    distinguishable. Wraps operators/search.bm25_topk (query terms
    broadcast and pruned before any index-wide work); pass
    ``n_salts > 0`` when queries contain very common terms at corpus
    scale."""
    from pathik_spark.operators.search import bm25_topk

    qlist = [queries] if isinstance(queries, str) else list(queries)
    if not qlist or any(not q.strip() for q in qlist):
        raise ValueError(
            "search_corpus: queries must be non-empty strings"
        )
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(i + 1, q) for i, q in enumerate(qlist)], "query_id long, query string"
    )
    hits = bm25_topk(
        docs, qdf, k=k, n_salts=n_salts, text_col=text_col, id_col=id_col
    )
    return hits.join(F.broadcast(qdf), "query_id").select(
        "query_id", "query", "doc_id", "score", "rnk"
    )


def _as_list(urls: str | list[str]) -> list[str]:
    if isinstance(urls, str):
        urls = [urls]
    if not urls:
        raise ValueError("No URLs provided")
    return list(urls)


def _pages_df(spark: SparkSession, pages: DataFrame | str) -> DataFrame:
    if isinstance(pages, str):
        return spark.read.parquet(pages)
    return pages


def _crawl_artifacts(
    spark: SparkSession,
    urls: list[str],
    pages: DataFrame | str,
    selector: str | None = None,
) -> DataFrame:
    """One fetch+extract pass over the url list; returns artifact rows
    keyed by the ORIGINAL input url string (url_raw)."""
    seeds = spark.createDataFrame(
        [(u, i, 0) for i, u in enumerate(urls)], "url string, seq long, priority int"
    )
    frontier = prepare_frontier(seeds)
    fetched = fetch_join(frontier, _pages_df(spark, pages))
    arts = extract_artifacts(fetched, with_markdown=True)
    if selector is not None:
        from pathik_spark.functions.extract_udfs import make_select_udf

        arts = arts.withColumn("selected", make_select_udf(selector)(F.col("html")))
    return arts


def _write_file(path: str, content: str | bytes, save_cap: int = SAVE_CAP) -> str:
    data = content.encode("utf-8") if isinstance(content, str) else bytes(content)
    with open(path, "wb") as f:
        f.write(data[:save_cap])  # storage.go:211-216 save-side cap
    return path


def crawl(
    urls: str | list[str],
    output_dir: str | None = None,
    parallel: bool = True,  # noqa: ARG001 — API parity; Spark is always parallel
    *,
    spark: SparkSession,
    pages: DataFrame | str,
    selector: str | None = None,
    selector_files: bool = False,
    save_cap: int = SAVE_CAP,
) -> dict[str, dict]:
    """Reference ``pathik.crawl``: fetch+extract each URL, write
    ``<sanitized>_<ts>.html`` / ``.md`` files under ``output_dir`` (a
    fresh temp dir when None — crawler.py:418-421), return
    ``{url: {"html": path, "markdown": path, "success": bool,
    "error": str|None}}`` (PathikFileResult, schema.py:43-66).

    ``selector`` (cli.py:129-131) extracts matched-element text into a
    "selected" result key; ``selector_files=True`` additionally writes
    it as ``<sanitized>_<ts>.selected.txt`` (schema.py:87-91).
    """
    urls = _as_list(urls)
    if output_dir is None:
        output_dir = tempfile.mkdtemp(prefix="pathik_")
    else:
        output_dir = os.path.abspath(output_dir)
        os.makedirs(output_dir, exist_ok=True)

    cols = ["url_raw", "url", "status", "filename_html", "filename_md", "html", "markdown"]
    if selector is not None:
        cols.append("selected")
    rows = _crawl_artifacts(spark, urls, pages, selector=selector).select(*cols).collect()
    by_raw = {r["url_raw"]: r for r in rows}

    result: dict[str, dict] = {}
    for u in urls:
        r = by_raw.get(u)
        if r is None:
            result[u] = {
                "html": None,
                "markdown": None,
                "success": False,
                "error": "invalid URL (failed validation)",
            }
            continue
        if r["status"] != "fetched":
            result[u] = {
                "html": None,
                "markdown": None,
                "success": False,
                "error": f"fetch failed: {r['status']}",
            }
            continue
        html_path = _write_file(
            os.path.join(output_dir, r["filename_html"]), r["html"], save_cap
        )
        md_path = _write_file(
            os.path.join(output_dir, r["filename_md"]), r["markdown"], save_cap
        )
        entry: dict = {"html": html_path, "markdown": md_path, "success": True, "error": None}
        if selector is not None:
            entry["selected"] = r["selected"]
            if selector_files:
                sel_name = r["filename_html"].rsplit(".", 1)[0] + ".selected.txt"
                entry["selected_file"] = _write_file(
                    os.path.join(output_dir, sel_name), r["selected"] or "", save_cap
                )
        result[u] = entry
    return result


def crawl_to_r2(
    urls: str | list[str],
    uuid_str: str | None = None,
    parallel: bool = True,  # noqa: ARG001 — API parity
    *,
    spark: SparkSession,
    pages: DataFrame | str,
    output_dir: str | None = None,
) -> dict[str, dict]:
    """Reference ``pathik.crawl_to_r2`` (crawler.py:508-578): returns
    per-url R2 object keys ``{uuid}+{sanitized}.{html|md}``
    (storage.go:129-131) plus the local file paths. The reference's
    random uuid is determinized as f(run_id, url) when ``uuid_str`` is
    None (sinks.deterministic_uuid) so runs replay."""
    urls = _as_list(urls)
    local = crawl(urls, output_dir=output_dir, spark=spark, pages=pages)
    arts = _crawl_artifacts(spark, urls, pages)
    run_id = uuid_str if uuid_str is not None else "r2"
    uuid_col = (
        F.lit(uuid_str) if uuid_str is not None else sinks.deterministic_uuid(run_id)
    )
    from pathik_spark.functions import urls as U

    keyed = (
        arts.filter(F.col("status") == "fetched")
        .select(
            "url_raw",
            uuid_col.alias("uuid"),
            U.r2_key_expr(uuid_col, F.col("url"), "html").alias("r2_html_key"),
            U.r2_key_expr(uuid_col, F.col("url"), "md").alias("r2_markdown_key"),
        )
        .collect()
    )
    by_raw = {r["url_raw"]: r for r in keyed}
    result: dict[str, dict] = {}
    for u in urls:
        r = by_raw.get(u)
        if r is None:
            result[u] = {"success": False, "error": local[u].get("error", "fetch failed")}
            continue
        result[u] = {
            "uuid": r["uuid"],
            "r2_html_key": r["r2_html_key"],
            "r2_markdown_key": r["r2_markdown_key"],
            "local_html_file": local[u]["html"],
            "local_markdown_file": local[u]["markdown"],
            "success": True,
        }
    return result


def stream_to_kafka(
    urls: str | list[str],
    content_type: str = "both",
    topic: str | None = None,
    session: str | None = None,
    parallel: bool = True,  # noqa: ARG001 — API parity
    compression_type: str | None = None,
    max_message_size: int | None = None,
    buffer_memory: int | None = None,
    *,
    spark: SparkSession,
    pages: DataFrame | str,
    brokers: str | None = None,
    username: str | None = None,
    password: str | None = None,
    use_tls: bool = False,
    output_table: str | None = None,
) -> dict[str, dict]:
    """Reference ``pathik.stream_to_kafka`` (pathik/__init__.py:40-208):
    crawl the urls and produce one Kafka message per (url, content_type)
    with url/timestamp/sessionID/contentType headers (kafka.go:226-273).

    With ``brokers`` set, messages go to the real broker via
    ``write.format("kafka")`` with the reference's producer config
    surface (SASL user/pass, TLS, compression, max size, buffer). The
    sandbox has no broker, so the default writes the identically-shaped
    rows as a parquet table at ``output_table`` (or leaves them lazy),
    mirroring the reference's own no-broker simulation fallback
    (pathik/__init__.py:73-77)."""
    urls = _as_list(urls)
    if content_type not in sinks.CONTENT_TYPES:
        raise ValueError(
            f"content_type must be one of {sinks.CONTENT_TYPES}, got {content_type}"
        )
    cfg = CrawlConfig(session_id=session).validate()  # main.go:67-87 session rule
    topic = topic or "pathik_crawl_data"  # reference default topic
    arts = _crawl_artifacts(spark, urls, pages)
    messages = sinks.kafka_message_rows(
        arts, content_type=content_type, session_id=cfg.session_id
    )
    delivered = "lazy"
    if brokers is not None:
        opts = sinks.kafka_writer_options(
            brokers,
            topic,
            username=username,
            password=password,
            use_tls=use_tls,
            compression_type=compression_type,
            max_message_size=max_message_size,
            buffer_memory=buffer_memory,
        )
        sinks.write_kafka_batch(messages, opts)
        delivered = "kafka"
    elif output_table is not None:
        messages.write.mode("overwrite").parquet(output_table)
        delivered = output_table

    ok = {
        r["url_raw"]
        for r in arts.filter(F.col("status") == "fetched").select("url_raw").collect()
    }
    result: dict[str, dict] = {}
    for u in urls:
        if u in ok:
            result[u] = {
                "success": True,
                "details": {
                    "topic": topic,
                    "content_type": content_type,
                    "session": cfg.session_id,
                    "sink": delivered,
                    **(
                        {"compression_type": compression_type}
                        if compression_type
                        else {}
                    ),
                },
            }
        else:
            result[u] = {"success": False, "error": "URL was not successfully crawled"}
    return result


def crawl_to_warc(
    urls: str | list[str],
    output_dir: str,
    *,
    spark: SparkSession,
    pages: DataFrame | str,
    prefix: str = "pathik",
    index_path: str | None = None,
) -> dict[str, dict]:
    """Crawl the urls and archive fetched pages as WARC (ISO 28500)
    files plus the CDX-style per-record index — the Common-Crawl-native
    output the batch engine exposes alongside local/R2/Kafka sinks.
    Returns per-url {success, path, offset, length} (the index entry,
    so any consumer can random-access its record), or {success: False,
    error} for misses."""
    urls = _as_list(urls)
    arts = _crawl_artifacts(spark, urls, pages)
    recs = sinks.warc_record_rows(
        arts.filter(F.col("status") == "fetched").select(
            F.col("url_raw"), "url", "warc_ts", "html", "status"
        )
    ).join(
        arts.select("url", "url_raw").distinct(), "url", "left"
    )
    idx_dir = index_path or (output_dir.rstrip("/") + "_cdx")
    sinks.write_warc_files(
        recs.select(F.col("url_raw").alias("url"), "record"),
        output_dir,
        prefix=prefix,
        index_path=idx_dir,
    )
    by_raw = {r["url"]: r for r in spark.read.parquet(idx_dir).collect()}
    result: dict[str, dict] = {}
    for u in urls:
        r = by_raw.get(u)
        if r is None:
            result[u] = {"success": False, "error": "fetch failed"}
        else:
            result[u] = {
                "success": True,
                "path": r["path"],
                "offset": r["offset"],
                "length": r["length"],
            }
    return result


def dedup_corpus(
    docs,
    method: str = "minhash",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    max_hamming: int = 3,
    html_col: str = "html",
    url_col: str = "url",
):
    """One-call corpus deduplication: every dedup family the engine
    implements behind one switch, each returning the same
    ``(kept, clusters)`` pair — ``kept`` is the input restricted to one
    canonical document (lowest id) per duplicate group, ``clusters`` the
    full (doc_id, cluster_id, cluster_size, is_canonical) labeling.

    methods:
    - ``exact``     — identical normalized content (hash groupBy);
    - ``minhash``   — MinHash LSH banding candidates VERIFIED by exact
                      n-gram Jaccard >= threshold (the near-dup default);
    - ``simhash``   — quadrant-blocked Hamming <= max_hamming;
    - ``cdc``       — content-defined-chunk containment >= threshold
                      (edit-robust: catches insert/delete edits);
    - ``semantic``  — SemDeDup over ``vec_col`` embeddings, cosine >=
                      threshold within coarse clusters;
    - ``canonical`` — the page-DECLARED groups: rel=canonical targets
                      (RFC 6596, operators/aliases) over ``html_col``/
                      ``url_col`` — zero content hashing, the cheapest
                      first pass when raw HTML is still around.

    Every arm is pair-generation (blocked/banded, never all-pairs) +
    connected components + canonical-min keep — the same 100 TB shapes
    the underlying operators document.
    """
    from pathik_spark.operators.dedup import (
        cdc_chunk_hashes,
        cdc_near_pairs,
        dedup_clusters,
        exact_dedup,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
        simhash_near_pairs,
        word_shingles,
    )

    base = docs.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else docs
    if method == "exact":
        labeled = exact_dedup(base, text_col=text_col)
        clusters = labeled.select(
            "doc_id",
            F.col("content_hash").alias("cluster_id"),
            F.col("group_size").alias("cluster_size"),
            "is_canonical",
        )
    elif method == "canonical":
        from pathik_spark.operators.aliases import (
            canonical_collapse,
            extract_canonical_links,
        )

        links = extract_canonical_links(base, html_col=html_col, url_col=url_col)
        groups = canonical_collapse(links)
        key = F.coalesce(
            F.nullif(F.col("canonical_url"), F.lit("")), F.col("url")
        )
        ids = base.select("doc_id", F.col(url_col).alias("url"))
        clusters = (
            links.withColumn("cluster_id", key)
            .join(ids, "url")
            .join(
                groups.withColumnRenamed("canonical_url", "cluster_id"),
                "cluster_id",
            )
            .select(
                "doc_id",
                "cluster_id",
                F.col("n_aliases").alias("cluster_size"),
                (F.col("url") == F.col("representative_url")).alias(
                    "is_canonical"
                ),
            )
        )
    elif method == "semantic":
        from pathik_spark.operators.ann import semdedup_keep

        keep = semdedup_keep(
            base.withColumnRenamed("doc_id", "vec_id"),
            threshold=threshold,
            vec_col=vec_col,
        )
        clusters = keep.select(
            F.col("vec_id").alias("doc_id"),
            F.col("cluster").cast("string").alias("cluster_id"),
            F.lit(None).cast("long").alias("cluster_size"),
            F.col("keep").alias("is_canonical"),
        )
    else:
        if method == "minhash":
            # distinct=False: both consumers dedup in-agg (see clean path)
            shingles = word_shingles(base, text_col=text_col, distinct=False)
            cands = lsh_candidate_pairs(
                minhash_signatures(shingles), compact32=True
            )
            pairs = jaccard_pairs(
                shingles, cands, threshold=threshold, hashed=True
            ).select(
                "doc_a", "doc_b"
            )
        elif method == "simhash":
            pairs = simhash_near_pairs(
                simhash(base, text_col=text_col), max_hamming=max_hamming
            ).select("doc_a", "doc_b")
        elif method == "cdc":
            pairs = cdc_near_pairs(
                cdc_chunk_hashes(base, text_col=text_col), threshold=threshold
            ).select("doc_a", "doc_b")
        else:
            raise ValueError(
                "method must be exact|minhash|simhash|cdc|semantic|canonical,"
                f" got {method!r}"
            )
        clusters = dedup_clusters(base, pairs).select(
            "doc_id",
            F.col("cluster_id").cast("string").alias("cluster_id"),
            "cluster_size",
            "is_canonical",
        )
    kept = base.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    )
    if id_col != "doc_id":
        kept = kept.withColumnRenamed("doc_id", id_col)
    return kept, clusters


def analyze_http_responses(records: DataFrame, max_hops: int = 10):
    """One-call HTTP-layer analysis of a response-record table (the
    Common-Crawl WARC ``response`` shape: url [, warc_ts], html=raw
    HTTP payload — e.g. sources/warc_source.read_warc_archives output):

    returns ``(meta, chains, ttls, delays)`` —

    - ``meta``: operators/revalidate.http_cache_meta — status, ETag,
      Last-Modified, Date, max-age, Expires, no-store per url;
    - ``chains``: operators/redirects.resolve_redirects over the parsed
      status/Location — (url, final_url, n_hops, terminal);
    - ``ttls``: operators/revalidate.cache_ttl_hours — the cache-
      declared per-URL recrawl TTL overlay;
    - ``delays``: operators/revalidate.retry_after_delays — per-host
      server-demanded backoff, ready for robots.apply_delay_overrides.

    All four are lazy plans over ONE input; the header parse is
    scan-local, so materializing several of them costs one corpus scan
    each with no joins between them (chains joins only within the small
    3xx subset).
    """
    from pathik_spark.operators.redirects import (
        http_response_meta,
        resolve_redirects,
    )
    from pathik_spark.operators.revalidate import (
        cache_ttl_hours,
        http_cache_meta,
        retry_after_delays,
    )

    meta = http_cache_meta(records)
    chains = resolve_redirects(http_response_meta(records), max_hops=max_hops)
    ttls = cache_ttl_hours(meta)
    delays = retry_after_delays(records)
    return meta, chains, ttls, delays


def export_tokenized_corpus(
    docs: DataFrame,
    out_dir: str,
    tokenizer: str = "bpe",
    vocab_size: int = 8000,
    n_merges: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Corpus -> trainer files, one call: train a tokenizer (``bpe`` or
    ``unigram``), encode every document scan-locally, map pieces to
    contiguous ids, and write Megatron/Fairseq ``.bin``/``.idx`` shards
    plus a ``vocab.json`` sidecar (piece -> id, in id order).

    Piece-id assignment is deterministic: BPE uses the merge-order
    vocabulary (operators/bpe.bpe_vocab — the order every BPE runtime
    uses); unigram sorts by (probability desc, piece). The id mapping
    rides the SAME mapInPandas pass as shard writing would read — one
    extra scan-local hop, no shuffle beyond the exporter's single
    deterministic repartition. Returns {'vocab_size', 'vocab_path',
    'shards': [(path, n_docs, n_tokens)], 'tokenizer'}.
    """
    import json
    import os
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from pathik_spark.sources.indexed_dataset import (
        write_indexed_token_shards,
    )

    if tokenizer == "bpe":
        from pathik_spark.operators.bpe import (
            bpe_encode,
            bpe_vocab,
            train_bpe,
        )

        merges = train_bpe(docs, n_merges=n_merges, text_col=text_col)
        base = sorted(
            {ch for a, b in merges for ch in (a + b)} | set("abcdefghijklmnopqrstuvwxyz0123456789")
        )
        pieces = bpe_vocab(merges, base)
        encoded = bpe_encode(docs, merges, text_col=text_col, id_col=id_col)
    elif tokenizer == "unigram":
        from pathik_spark.operators.unigram import (
            train_unigram,
            unigram_encode,
        )

        model = train_unigram(docs, vocab_size=vocab_size, text_col=text_col)
        pieces = [p for p, _ in sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))]
        encoded = unigram_encode(docs, model, text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")

    ids_of = {p: i for i, p in enumerate(pieces)}
    unk = len(ids_of)  # one reserved id for out-of-vocab pieces

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("token_ids", T.ArrayType(T.IntegerType())),
        ]
    )

    def _to_ids(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "token_ids": [
                        [ids_of.get(t, unk) for t in toks]
                        for toks in pdf["tokens"]
                    ],
                }
            )

    ids = encoded.select("doc_id", "tokens").mapInPandas(_to_ids, schema)
    summary = write_indexed_token_shards(
        ids, out_dir, n_shards=n_shards, vocab_size=unk + 1
    )
    os.makedirs(out_dir, exist_ok=True)
    vocab_path = os.path.join(out_dir, "vocab.json")
    with open(vocab_path, "w") as f:
        json.dump({p: i for i, p in enumerate(pieces)} | {"<unk>": unk}, f)
    return {
        "tokenizer": tokenizer,
        "vocab_size": unk + 1,
        "vocab_path": vocab_path,
        "shards": [(s["path"], s["n_docs"], s["n_tokens"]) for s in summary],
    }
