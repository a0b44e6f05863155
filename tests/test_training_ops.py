"""Tests for the round-2 training-data operators: decontamination,
deterministic sampling / domain mix, sequence chunking, token-stream
packing, and crawl-trap detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.chunking import chunk_documents, pack_token_stream
from pathik_spark.operators.decontaminate import contamination, decontaminate
from pathik_spark.operators.sampling import (
    DENOM,
    domain_mix,
    domain_mix_rates,
    hash_sample,
    stratified_sample,
)
from pathik_spark.operators.traps import filter_traps, trap_signals


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- decontamination ---------------------------------------------------------


def test_contamination_flags_exact_benchmark_member(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated sentence with distinct words here"),
            (3, "the quick brown fox jumps over a sleeping cat instead"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps over the lazy dog")])
    rep = {
        r["doc_id"]: r.asDict()
        for r in contamination(docs, bench, n=5).collect()
    }
    assert rep[1]["contaminated"] and not rep[1]["keep"]
    assert not rep[2]["contaminated"] and rep[2]["keep"]
    # doc 3 shares the 5-gram "quick brown fox jumps over"
    assert rep[3]["contaminated"]
    assert rep[1]["n_collisions"] > rep[3]["n_collisions"] > 0


def test_contamination_short_docs_kept(spark):
    docs = _docs(spark, [(1, "too short"), (2, "")])
    bench = _docs(spark, [(9, "too short")])
    rep = {r["doc_id"]: r.asDict() for r in contamination(docs, bench, n=8).collect()}
    assert rep[1]["n_ngrams"] == 0 and rep[1]["keep"]
    assert rep[2]["n_ngrams"] == 0 and rep[2]["keep"]


def test_contamination_threshold(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j k l")])
    bench = _docs(spark, [(9, "a b c d e f")])  # 2 distinct 5-grams shared... compute
    strict = contamination(docs, bench, n=5, max_collisions=0).collect()[0]
    loose = contamination(docs, bench, n=5, max_collisions=10).collect()[0]
    assert strict["contaminated"] and not loose["contaminated"]


def test_decontaminate_removes_only_contaminated(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
    )
    bench = _docs(spark, [(9, "alpha beta gamma delta epsilon zeta")])
    kept = decontaminate(docs, bench, n=4)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_contamination_broadcast_plan(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    bench = _docs(spark, [(9, "a b c d e")])
    plan = contamination(docs, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


# --- sampling ---------------------------------------------------------------


def test_hash_sample_deterministic_and_rate(spark):
    df = spark.range(20000).select(F.concat(F.lit("u"), "id").alias("url"))
    a = hash_sample(df, 0.25, key_col="url")
    b = hash_sample(df, 0.25, key_col="url")
    ca, cb = a.count(), b.count()
    assert ca == cb  # pure function of (salt, key)
    assert abs(ca / 20000 - 0.25) < 0.02
    # nested property: a 10% sample is a subset of the 25% sample
    small = hash_sample(df, 0.10, key_col="url")
    assert small.join(a, "url", "left_anti").count() == 0


def test_hash_sample_salt_changes_selection(spark):
    df = spark.range(5000).select(F.concat(F.lit("u"), "id").alias("url"))
    a = set(r["url"] for r in hash_sample(df, 0.3, salt="s1").collect())
    b = set(r["url"] for r in hash_sample(df, 0.3, salt="s2").collect())
    assert a != b


def test_stratified_sample_rates_and_missing_group(spark):
    df = (
        spark.range(30000)
        .select(
            F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
            F.concat(F.lit("u"), "id").alias("url"),
        )
    )
    rates = spark.createDataFrame(
        [("h0", 1.0), ("h1", 0.2)], "host string, rate double"
    )
    out = stratified_sample(df, rates).groupBy("host").count().collect()
    got = {r["host"]: r["count"] for r in out}
    assert got["h0"] == 10000
    assert abs(got["h1"] / 10000 - 0.2) < 0.03
    assert "h2" not in got  # absent stratum -> dropped
    assert "_thr" not in stratified_sample(df, rates).columns


def test_domain_mix_hits_targets(spark):
    # 12000 h0 / 6000 h1 / 2000 h2 -> target equal thirds: binding
    # stratum is h2 (2000 available for 1/3 share) -> ~2000 each
    df = (
        spark.range(20000)
        .select(
            F.when(F.col("id") < 12000, "h0")
            .when(F.col("id") < 18000, "h1")
            .otherwise("h2")
            .alias("host"),
            F.concat(F.lit("u"), "id").alias("url"),
        )
    )
    targets = {"h0": 1.0, "h1": 1.0, "h2": 1.0}
    rates = {r["host"]: r["rate"] for r in domain_mix_rates(df, targets, group_col="host").collect()}
    assert rates["h2"] == 1.0
    assert abs(rates["h0"] - 2000 / 12000) < 1e-9
    out = domain_mix(df, targets, group_col="host").groupBy("host").count().collect()
    got = {r["host"]: r["count"] for r in out}
    assert got["h2"] == 2000
    for h in ("h0", "h1"):
        assert abs(got[h] - 2000) < 200  # hash-lattice noise


# --- chunking ----------------------------------------------------------------


def test_chunk_documents_exact_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [(1, text)])
    rows = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        for r in chunk_documents(docs, seq_len=4, stride=3).collect()
    )
    # starts 0,3,6,9: windows of 4,4,4,1 tokens
    assert [(a, b, c) for a, b, c, _ in rows] == [
        (0, 0, 4),
        (1, 3, 4),
        (2, 6, 4),
        (3, 9, 1),
    ]
    assert rows[0][3] == "t0 t1 t2 t3"
    assert rows[1][3] == "t3 t4 t5 t6"
    assert rows[3][3] == "t9"


def test_chunk_documents_min_tokens_and_empty(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, ""), (3, "   ")])
    out = chunk_documents(docs, seq_len=4, stride=4, min_tokens=2).collect()
    assert {(r["doc_id"], r["chunk_idx"]) for r in out} == {(1, 0)}  # trailing 1-tok sliver dropped


def test_empty_docs_produce_no_chunks_or_pack_rows(spark):
    """split('') == [''] must NOT count as one token: empty and
    whitespace-only docs emit zero chunk windows (even at the default
    min_tokens=1) and zero pack segments — no phantom token leaks into
    the packed stream (ADVICE round-2 fix)."""
    docs = _docs(spark, [(1, ""), (2, "   \n\t "), (3, "one two")])
    chunks = chunk_documents(docs, seq_len=4, stride=4).collect()
    assert {r["doc_id"] for r in chunks} == {3}
    packs = pack_token_stream(docs, seq_len=4, n_shards=2).collect()
    assert {r["doc_id"] for r in packs} == {3}
    assert sum(r["n_tok"] for r in packs) == 2  # exactly doc 3's tokens


def test_domain_mix_zero_available_group_warns(spark):
    """A targeted group with no documents zeroes every rate (strict
    water-filling) — that must warn loudly, not silently empty the
    corpus (ADVICE round-2 fix)."""
    import warnings

    from pathik_spark.operators.sampling import domain_mix_rates

    df = spark.createDataFrame(
        [(i, "a.com" if i % 2 else "b.com") for i in range(20)], "doc_id long, host string"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rates = domain_mix_rates(df, {"a.com": 0.5, "nosuch.com": 0.5}).collect()
    assert any("zero available" in str(w.message) for w in caught)
    assert all(r["rate"] == 0.0 for r in rates)
    # and the happy path stays silent
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        domain_mix_rates(df, {"a.com": 0.5, "b.com": 0.5}).collect()
    assert not any("zero available" in str(w.message) for w in caught2)


def test_chunk_reconstruction_roundtrip(spark, corpus):
    """Non-overlapping chunks re-concatenate to the normalized text."""
    from pathik_spark.operators.dedup import normalized_text

    docs = corpus["pages"].select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    ).limit(50)
    chunks = chunk_documents(docs, seq_len=7)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))).getField("chunk_text"), " ").alias("rebuilt"))
    )
    joined = docs.select(
        "doc_id", normalized_text(F.col("text")).alias("want")
    ).join(rebuilt, "doc_id", "left")
    bad = joined.filter(
        (F.length("want") > 0) & (F.col("rebuilt") != F.col("want"))
    ).count()
    assert bad == 0


def test_pack_token_stream_invariants(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 23))) for i in range(60)],
    )
    seq_len = 16
    packs = pack_token_stream(docs, seq_len=seq_len, n_shards=4).collect()
    # 1) per-doc coverage: segments tile [0, n_tok_doc) without gaps
    by_doc: dict[int, list] = {}
    for r in packs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tok = {i: 5 + (i * 7) % 23 for i in range(60)}
    for d, segs in by_doc.items():
        segs = sorted(segs, key=lambda r: r["doc_tok_start"])
        assert segs[0]["doc_tok_start"] == 0
        pos = 0
        for s in segs:
            assert s["doc_tok_start"] == pos
            pos += s["n_tok"]
        assert pos == n_tok[d]
    # 2) per-pack: offsets tile [0, seq_len) contiguously; only a
    # shard's LAST pack may be short
    by_pack: dict[int, list] = {}
    for r in packs:
        by_pack.setdefault(r["pack_id"], []).append(r)
    by_shard_last = {}
    for pid in by_pack:
        sh = pid >> 40
        by_shard_last[sh] = max(by_shard_last.get(sh, -1), pid)
    for pid, segs in by_pack.items():
        segs = sorted(segs, key=lambda r: r["pack_tok_start"])
        assert segs[0]["pack_tok_start"] == 0
        pos = 0
        for s in segs:
            assert s["pack_tok_start"] == pos
            pos += s["n_tok"]
        if pid != by_shard_last[pid >> 40]:
            assert pos == seq_len
        else:
            assert 0 < pos <= seq_len


def test_pack_token_stream_deterministic(spark):
    docs = _docs(spark, [(i, " ".join("x" * 1 for _ in range(3 + i % 9))) for i in range(40)])
    a = sorted(map(tuple, pack_token_stream(docs, seq_len=8).collect()))
    b = sorted(map(tuple, pack_token_stream(docs.repartition(7), seq_len=8).collect()))
    assert a == b


# --- traps -------------------------------------------------------------------


TRAP_CASES = [
    ("https://a.example/x/y/z", False),  # clean
    ("https://a.example/" + "/".join(f"d{i}" for i in range(13)), True),  # depth
    ("https://a.example/a/b/a/b/a", True),  # cycle: 'a' x3
    ("https://a.example/p?" + "&".join(f"k{i}=v" for i in range(9)), True),  # params
    ("https://a.example/archive/20240101123456/post", True),  # digit run
    ("https://a.example/p?a=1&b=2", False),
    ("https://a.example/x/x", False),  # repeat of 2 allowed
    ("https://a.example/" + "q" * 600, True),  # length
]


def test_trap_signals_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in TRAP_CASES], "url string")
    got = {r["url"]: r["is_trap"] for r in trap_signals(df).collect()}
    for u, want in TRAP_CASES:
        assert got[u] == want, u


def test_filter_traps_preserves_columns(spark):
    df = spark.createDataFrame(
        [(u, i) for i, (u, _) in enumerate(TRAP_CASES)], "url string, seq int"
    )
    out = filter_traps(df)
    assert out.columns == ["url", "seq"]
    assert out.count() == sum(1 for _, t in TRAP_CASES if not t)


def test_trap_signals_no_shuffle(spark):
    df = spark.createDataFrame([(u,) for u, _ in TRAP_CASES], "url string")
    plan = trap_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---- temperature-scaled language mix (mC4/UniMax family) -------------------


def test_temperature_mix_rates_closed_form(spark):
    from pathik_spark.operators.sampling import temperature_mix_rates

    rows = [(i, "en") for i in range(400)] + [(i + 1000, "de") for i in range(100)] + [
        (i + 2000, "sw") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {r["lang"]: r["rate"] for r in temperature_mix_rates(df, alpha=0.3, group_col="lang").collect()}
    assert rates["sw"] == 1.0                      # smallest group binds, kept fully
    assert rates["de"] == round((25 / 100) ** 0.7, 6)
    assert rates["en"] == round((25 / 400) ** 0.7, 6)
    assert rates["sw"] > rates["de"] > rates["en"]  # tail upweighted relative to head


def test_temperature_mix_alpha_limits(spark):
    from pathik_spark.operators.sampling import temperature_mix_rates

    rows = [(i, "en") for i in range(300)] + [(i + 1000, "sw") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    raw = {r["lang"]: r["rate"] for r in temperature_mix_rates(df, alpha=1.0).collect()}
    assert raw == {"en": 1.0, "sw": 1.0}           # alpha=1: raw distribution
    uni = {r["lang"]: r["rate"] for r in temperature_mix_rates(df, alpha=0.0).collect()}
    assert uni["sw"] == 1.0 and uni["en"] == 0.1   # alpha=0: equalize to n_min


def test_temperature_mix_deterministic_and_flattening(spark):
    from pathik_spark.operators.sampling import temperature_mix

    rows = [(i, "en") for i in range(800)] + [(i + 10_000, "sw") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    once = temperature_mix(df, alpha=0.3).groupBy("lang").count().collect()
    twice = temperature_mix(df.repartition(17), alpha=0.3).groupBy("lang").count().collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))  # hash-determined
    got = {r["lang"]: r["count"] for r in once}
    # head language flattened toward (but not exactly at) the expected rate
    expected_en = 800 * (50 / 800) ** 0.7
    assert abs(got["en"] - expected_en) / expected_en < 0.25
    assert got["sw"] == 50                          # binding group fully kept


def test_temperature_mix_rejects_bad_alpha(spark):
    import pytest as _pytest

    from pathik_spark.operators.sampling import temperature_mix_rates

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError):
        temperature_mix_rates(df, alpha=1.5)


# ---- retrieval-based (BM25) contamination audit ----------------------------


def test_retrieval_contamination_finds_reworded_copy(spark):
    from pathik_spark.operators.decontaminate import (
        retrieval_contamination,
        retrieval_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, "the capital of france is paris and it sits on the seine"),
            (1, "capital of france paris seine river geography"),  # reworded copy
            (2, "spark shuffles partition data across executors"),
            (3, "gardening tips for tomato plants in spring"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "What is the capital of France? Paris, on the Seine.")],
        "bench_id long, text string",
    )
    hits = retrieval_contamination(corpus, bench, k=2).collect()
    assert {r["doc_id"] for r in hits} == {0, 1}   # both variants surface
    assert all(r["bench_id"] == 100 for r in hits)
    ranked = sorted(hits, key=lambda r: r["rnk"])
    assert ranked[0]["score"] >= ranked[1]["score"] > 0

    clean = retrieval_decontaminate(corpus, bench, k=2)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}


def test_retrieval_contamination_min_score_gate(spark):
    from pathik_spark.operators.decontaminate import retrieval_contamination

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "alpha beta")], "bench_id long, text string")
    all_hits = retrieval_contamination(corpus, bench, k=5).collect()
    assert {r["doc_id"] for r in all_hits} == {0}  # no shared term -> no candidate
    gated = retrieval_contamination(corpus, bench, k=5, min_score=10_000.0).collect()
    assert gated == []                              # threshold filters the audit


# ---- per-group best-k curation ---------------------------------------------


def test_best_per_group_selects_and_ties(spark):
    from pathik_spark.operators.sampling import best_per_group

    rows = [
        (0, "a", 0.9), (1, "a", 0.8), (2, "a", 0.8), (3, "a", 0.1),
        (4, "b", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, quality double")
    out = best_per_group(df, k=2, group_col="host", order_col="quality").collect()
    got = {(r["host"], r["rnk"]): r["doc_id"] for r in out}
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 4}  # tie -> lower doc_id


def test_best_per_group_salted_equals_unsalted(spark):
    from pathik_spark.operators.sampling import best_per_group

    rows = [(i, f"h{i % 5}", float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, host string, quality double")
    plain = sorted(map(tuple, best_per_group(df, k=7, group_col="host").collect()))
    salted = sorted(
        map(tuple, best_per_group(df, k=7, group_col="host", n_salts=4).collect())
    )
    assert plain == salted and len(plain) == 5 * 7


def test_temperature_mix_plan_broadcasts_rates(spark):
    from pathik_spark.operators.sampling import temperature_mix

    rows = [(i, "en" if i % 3 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plan = (
        temperature_mix(df, alpha=0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the tiny rates side broadcasts; the corpus is filtered in-scan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_bucket_balanced_sample_caps_and_determinism(spark):
    from pathik_spark.operators.sampling import bucket_balanced_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 150"
    )
    out = bucket_balanced_sample(emb, k=3, n_planes=4, dim=64)
    rows = out.select("vec_id", "bucket", "rnk").collect()
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], []).append(r["vec_id"])
    assert all(len(v) <= 3 for v in per_bucket.values())
    # deterministic: lowest ids per bucket, independent of partitioning
    again = bucket_balanced_sample(
        emb.repartition(7), k=3, n_planes=4, dim=64
    ).select("vec_id", "bucket", "rnk").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bucket_balanced_sample_order_col(spark):
    from pathik_spark.operators.sampling import bucket_balanced_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 150"
    ).withColumn("quality", (F.col("vec_id") % 7).cast("double"))
    out = bucket_balanced_sample(
        emb, k=1, n_planes=2, dim=64, order_col="quality"
    ).collect()
    # the kept row per bucket has the max quality in its bucket
    allb = bucket_balanced_sample(emb, k=10**6, n_planes=2, dim=64).collect()
    best = {}
    for r in allb:
        q = r["vec_id"] % 7
        cur = best.get(r["bucket"])
        if cur is None or q > cur[0] or (q == cur[0] and r["vec_id"] < cur[1]):
            best[r["bucket"]] = (q, r["vec_id"])
    assert {(r["bucket"], r["vec_id"]) for r in out} == {
        (b, v) for b, (q, v) in best.items()
    }


def test_pack_token_stream_eos_separator(spark):
    from pathik_spark.operators.chunking import pack_token_stream

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "")], ["doc_id", "text"]
    )
    out = pack_token_stream(docs, seq_len=4, n_shards=1, eos_tokens=1).collect()
    # stream: doc1 (3+1 eos) + doc2 (2+1 eos) = 7 tokens; empty doc gone
    assert sum(r["n_tok"] for r in out) == 7
    assert {r["doc_id"] for r in out} == {1, 2}
    # without eos the stream is 5 tokens, unchanged behavior
    base = pack_token_stream(docs, seq_len=4, n_shards=1).collect()
    assert sum(r["n_tok"] for r in base) == 5


def test_exact_k_sample_deterministic_exact_count(spark):
    from pathik_spark.operators.sampling import exact_k_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    s1 = {r["doc_id"] for r in exact_k_sample(docs, 50).collect()}
    s2 = {r["doc_id"] for r in exact_k_sample(docs.repartition(7), 50).collect()}
    assert len(s1) == 50 and s1 == s2          # exact count, partition-proof
    other = {r["doc_id"] for r in exact_k_sample(docs, 50, salt="redraw").collect()}
    assert other != s1                          # salt redraws
    assert exact_k_sample(docs, 0).count() == 0


def test_exact_k_sample_plan_is_take_ordered(spark):
    from pathik_spark.operators.sampling import exact_k_sample

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    plan = (
        exact_k_sample(df, 10)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_soft404_plan_is_scan_local(spark):
    from pathik_spark.operators.quality import soft404_signals

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("some text").alias("text")
    )
    plan = (
        soft404_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure expressions, no shuffle


def test_compression_signals_exact_and_band(spark):
    import zlib

    from pathik_spark.operators.quality import (
        COMPRESSION_LEVEL,
        compression_signals,
    )

    rows = [
        (1, "The quick brown fox jumped over a lazy dog while seventeen "
            "musicians rehearsed quietly behind the old library, and nobody "
            "expected the harbor master to arrive early with fresh charts "
            "of unexplored coastline or bring gifts from distant ports."),
        (2, "ab" * 4000),                       # long-period repetition spam
        (3, "x" * 30),                          # tiny: keeps unconditionally
        (4, ""),                                # empty: ratio 0, tiny-keep
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    # exact parity with an in-test reference at the pinned level
    for doc_id, text in rows:
        b = text.encode("utf-8")
        assert got[doc_id]["raw_len"] == len(b)
        assert got[doc_id]["compressed_len"] == len(
            zlib.compress(b, COMPRESSION_LEVEL)
        )
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["ratio_micro"] < 300_000
    assert got[3]["keep"] is True and got[4]["keep"] is True


def test_split_leakage_report_and_domain_keyed_fix(spark):
    from pathik_spark.operators.sampling import hash_split, split_leakage_report

    docs = spark.createDataFrame(
        [(i, f"h{i % 5}.example") for i in range(200)],
        "doc_id long, host string",
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    # url-keyed split: every host spans splits (5 hosts, 40 docs each)
    leaky = split_leakage_report(hash_split(docs, w, key_col="doc_id"))
    rows = leaky.collect()
    assert len(rows) == 5
    assert all(r["n_splits"] >= 2 and r["n_rows"] == 40 for r in rows)
    assert all(r["splits"] == ",".join(sorted(r["splits"].split(","))) for r in rows)
    # the fix the report motivates: key the split by the GROUP
    fixed = split_leakage_report(hash_split(docs, w, key_col="host"))
    assert fixed.count() == 0
