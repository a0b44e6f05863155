"""Parity sweep: the relational CDC chunker == an independent
pure-Python reference on 200 randomized adversarial texts (seeded, one
Spark job). The reference implements the documented law from scratch —
different code path, same spec (operators/dedup.cdc_chunk_hashes)."""

from __future__ import annotations

import hashlib
import random
import re

from pathik_spark.operators.dedup import cdc_chunk_hashes

WINDOW, AVG = 3, 4


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def ref_chunks(text: str, window: int = WINDOW, avg: int = AVG):
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip()
    if not norm:
        return []
    toks = norm.split(" ")
    n = len(toks)
    cuts = (
        [e for e in range(window, n) if _ph(" ".join(toks[e - window:e])) % avg == 0]
        if n > window
        else []
    )
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [n]
    n_chunks = len(starts)
    return [
        (i, _ph(" ".join(toks[s - 1:e])), n_chunks)
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


def _gen_corpus(n_docs: int = 200, seed: int = 20260819):
    rng = random.Random(seed)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        ".,;:!?-_/()'\"éß中ø"
    )
    ws = [" ", "  ", "\t", "\n", " \t ", "\r\n"]
    docs = []
    for i in range(n_docs):
        if i % 23 == 0:
            docs.append((i, rng.choice(["", " ", "\t\n", "   "])))
            continue
        n_tok = rng.randint(1, 60)
        toks = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(n_tok)
        ]
        # planted repetition so duplicate chunk hashes occur
        if i % 5 == 0 and n_tok > 6:
            toks[3:6] = toks[0:3]
        docs.append((i, rng.choice(ws).join(toks) + rng.choice(ws)))
    return docs


def test_cdc_chunks_match_reference_on_adversarial_corpus(spark):
    docs = _gen_corpus()
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"], r["n_chunks"])
        for r in cdc_chunk_hashes(sdf, window=WINDOW, avg_chunk=AVG).collect()
    }
    want = {
        (doc_id, idx, h, n)
        for doc_id, text in docs
        for idx, h, n in ref_chunks(text)
    }
    assert got == want
