"""Content-dedup operator family over the driver's documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import dedup as D

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    df.count()
    return df


def test_exact_dedup_keeps_one_canonical_per_group(spark, docs):
    out = D.exact_dedup(docs).cache()
    per_group = out.groupBy("content_hash").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.count("*").alias("n"),
        F.max("group_size").alias("gs"),
    )
    assert per_group.filter(F.col("n_canon") != 1).count() == 0
    assert per_group.filter(F.col("n") != F.col("gs")).count() == 0
    # duplicates exist in the synthetic corpus or not — either way total rows preserved
    assert out.count() == docs.count()


def test_minhash_lsh_finds_exact_duplicates(spark, docs):
    # construct known near-dups: copy 5 docs with a tiny suffix change
    base = docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
    )
    aug = docs.select("doc_id", "text").unionByName(base)
    sh = D.word_shingles(aug, n=3)
    sig = D.minhash_signatures(sh, num_hashes=16)
    cands = D.lsh_candidate_pairs(sig, num_hashes=16, band_size=2)
    verified = D.jaccard_pairs(sh, cands, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    expected = {(i, i + 100000) for i in range(5)}
    missing = expected - pairs
    assert not missing, f"LSH missed planted near-dups: {missing}"


def test_jaccard_candidates_path_matches_exact_path(spark, docs):
    """The candidates (LSH-verify) path uses a physically different plan
    (collect_set + array_intersect, no shingle self-join) — its values
    must equal the exact all-pairs path restricted to the same pairs,
    and duplicate shingle rows (distinct=False) must not change them."""
    aug = docs.limit(40).select("doc_id", "text")
    sh = D.word_shingles(aug, n=3)
    sig = D.minhash_signatures(sh, num_hashes=16)
    cands = D.lsh_candidate_pairs(sig, num_hashes=16, band_size=2)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in D.jaccard_pairs(sh, cands).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in D.jaccard_pairs(sh).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert got == {p: v for p, v in exact.items() if p in cand_set}
    # multiset input: collect_set dedups in-agg -> identical values
    sh_multi = D.word_shingles(aug, n=3, distinct=False)
    got_multi = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in D.jaccard_pairs(sh_multi, cands).collect()
    }
    assert got_multi == got
    # hashed production arm: xxhash64 set elements, same values (no
    # collisions at any realistic doc size)
    got_hashed = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in D.jaccard_pairs(sh, cands, hashed=True).collect()
    }
    assert got_hashed == got
    # plan shape: the verify step must not self-join the shingle table —
    # the intersection is computed scan-locally on per-doc sets
    plan = D.jaccard_pairs(sh, cands)._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "q r s t u")],
        "doc_id long, text string",
    )
    sh = D.word_shingles(df, n=2)  # doc1: ab,bc,cd,de ; doc2: ab,bc,cd,dx
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.jaccard_pairs(sh).collect()}
    assert out[(1, 2)] == round(3 / 5, 6)
    assert (1, 3) not in out and (2, 3) not in out


def test_simhash_near_pairs(spark, docs):
    base = docs.limit(4).select(
        (F.col("doc_id") + 200000).alias("doc_id"), F.col("text")
    )
    aug = docs.select("doc_id", "text").unionByName(base)
    fp = D.simhash(aug)
    pairs = D.simhash_near_pairs(fp, max_hamming=0)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(i, i + 200000) for i in range(4)} <= got


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    vals = ["alpha", "beta gamma", "", "日本語"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", D.portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        expected = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == expected, v


def test_connected_components_known_graph(spark):
    # components {1..4} (chain), {10,11}, {20,21,22} (triangle-ish), long
    # chain 30..37 (forces >1 large/small-star round), self-loop dropped
    edges = [
        (2, 1), (3, 2), (4, 3),
        (10, 11),
        (20, 21), (21, 22), (20, 22),
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35), (35, 36), (36, 37),
        (5, 5),
    ]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in D.connected_components(df).collect()
    }
    want = (
        {(i, 1) for i in (1, 2, 3, 4)}
        | {(10, 10), (11, 10)}
        | {(i, 20) for i in (20, 21, 22)}
        | {(i, 30) for i in range(30, 38)}
    )
    assert got == want


def test_connected_components_matches_union_find(spark):
    # randomized graphs vs a driver-side union-find oracle
    import random

    rng = random.Random(1234)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(30, 140))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {}
        for x in touched:
            root = find(x)
            want[x] = min(y for y in touched if find(y) == root)
        df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in D.connected_components(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_dedup_clusters_labels_every_doc(spark, docs):
    sub = docs.filter(F.col("doc_id") < 150)
    sh = D.word_shingles(sub, n=3)
    sig = D.minhash_signatures(sh, num_hashes=16, portable=True)
    cands = D.lsh_candidate_pairs(sig, num_hashes=16, band_size=2, portable=True)
    pairs = D.jaccard_pairs(sh, cands, threshold=0.4)
    out = D.dedup_clusters(sub, pairs).cache()
    assert out.count() == sub.count()
    # exactly one canonical per cluster, and it is the cluster min
    bad = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.min("doc_id").alias("lo"),
    ).filter((F.col("n_canon") != 1) | (F.col("lo") != F.col("cluster_id")))
    assert bad.count() == 0
    # cluster_size consistent with the labeling
    sz = out.groupBy("cluster_id").count()
    mism = out.join(sz, "cluster_id").filter(F.col("cluster_size") != F.col("count"))
    assert mism.count() == 0


def test_cdc_chunks_edit_locality_and_shapes(spark):
    from pathik_spark.operators.dedup import cdc_chunk_hashes, cdc_near_pairs

    words = [f"w{i % 23}x{i % 7}" for i in range(80)]
    base = " ".join(words)
    # one token inserted mid-document: boundaries move only locally
    edited = " ".join(words[:40] + ["INSERTED"] + words[40:])
    other = " ".join(f"z{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, other), (4, ""), (5, "only three words")],
        ["doc_id", "text"],
    )
    chunks = cdc_chunk_hashes(docs, window=3, avg_chunk=4)
    rows = chunks.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc                       # empty doc -> no rows
    assert len(by_doc[5]) == 1                   # n <= window: one chunk
    assert by_doc[5][0]["n_chunks"] == 1
    # determinism across partitionings
    again = cdc_chunk_hashes(docs.repartition(5), window=3, avg_chunk=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # edit locality: base/edited share most chunks; unrelated shares none
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in cdc_near_pairs(chunks, threshold=0.4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert not any(3 in p for p in pairs)


def test_cdc_near_pairs_max_df_drops_boilerplate(spark):
    from pathik_spark.operators.dedup import cdc_near_pairs

    # every doc shares one hot chunk; only 1-2 share a rare chunk
    rows = [(d, 0, 999, 2) for d in range(10)] + [(0, 1, 111, 2), (1, 1, 111, 2)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, chunk_hash long, n_chunks int"
    )
    got = cdc_near_pairs(chunks, threshold=0.4, max_df=5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1)}
    # without the cap the hot chunk creates all 45 pairs
    assert cdc_near_pairs(chunks, threshold=0.4, max_df=None).count() == 45


def test_host_mirror_pairs_detects_mirrors(spark):
    from pathik_spark.operators.dedup import host_mirror_pairs

    pages = [("m1", f"unique content piece number {i}") for i in range(10)]
    pages += [("m2", f"unique content piece number {i}") for i in range(8)]  # mirror
    pages += [("other", f"different text entirely {i}") for i in range(10)]
    # boilerplate page served by every host
    pages += [(h, "terms of service boilerplate") for h in ("m1", "m2", "other")]
    docs = spark.createDataFrame(pages, ["host", "text"])
    out = {
        (r["host_a"], r["host_b"]): r
        for r in host_mirror_pairs(docs, threshold=0.5, max_df=2).collect()
    }
    assert ("m1", "m2") in out
    r = out[("m1", "m2")]
    assert r["shared"] == 8 and abs(r["containment"] - 8 / 9) < 1e-6
    assert not any("other" in p for p in out)


def test_compact32_banding_superset_and_verified_equal(spark):
    """The int32 band-id-folded arm: its candidate set is a SUPERSET of
    the struct-banded arm's on the same signatures (folding can only
    merge buckets, never split one), and after exact-Jaccard
    verification the outputs are identical — for BOTH hash families."""
    from pathik_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    rows = []
    for i in range(40):
        base = f"the quick brown fox {i % 7} jumps over the lazy dog {i % 5} again and again"
        if i % 4 == 0:
            base += " near duplicate tail"
        rows.append((i, base))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(docs, n=3)
    for portable in (False, True):
        sig = minhash_signatures(sh, num_hashes=16, portable=portable)
        wide = lsh_candidate_pairs(sig, 16, 2, portable=portable)
        lean = lsh_candidate_pairs(sig, 16, 2, portable=portable, compact32=True)
        w = {(r["doc_a"], r["doc_b"]) for r in wide.collect()}
        l = {(r["doc_a"], r["doc_b"]) for r in lean.collect()}
        assert w <= l
        vw = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(sh, wide, threshold=0.4).collect()
        }
        vl = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(sh, lean, threshold=0.4).collect()
        }
        assert vw == vl and vw
