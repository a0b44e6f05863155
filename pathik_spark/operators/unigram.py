"""Unigram-LM (SentencePiece-style) tokenizer: training and encoding.

The other half of the learned-tokenizer family next to operators/
bpe.py — Kudo (2018)'s unigram language model: pieces carry
probabilities, a word's segmentation is the max-likelihood path
through the piece lattice, and training is EM + pruning from a large
seed vocabulary down to the target size.

Scale shape — identical to BPE's, and for the same reason: unigram
training is a function of the WORD FREQUENCY dictionary (expected
piece counts are linear in word counts), and the dictionary is
zipf-bounded (~10^6-10^7 distinct words at 100 TB) while the corpus
is not. So:

  1. ONE distributed stage: the shared ``bpe.word_counts`` groupBy
     (map-side combined, the only shuffle), top ``max_words`` by
     (count desc, word) — deterministic bounded driver transfer.
  2. Seeding, EM (forward-backward expected counts) and pruning run
     DRIVER-SIDE over that dictionary. Pure sequential float ops —
     bit-deterministic, no RNG.
  3. Encoding back over the corpus is scan-local: Viterbi per
     DISTINCT word with a per-batch memo (operators/bpe.bpe_encode's
     shape), ties broken (fewer pieces, lexicographically smaller
     path) so segmentation is deterministic.

Simplifications vs the SentencePiece binary (declared): seeding takes
the top substrings by (summed count x length) rather than the ESA
suffix-array heuristic; pruning drops the lowest-probability
multi-char pieces by fixed fraction per round rather than exact
likelihood-loss ranking. Both preserve the algorithm's character:
EM-fit piece probabilities, guaranteed single-char coverage, ML
segmentation.

Verification: the distributed stage reuses the DuckDB-oracled
`bpe_word_counts`; EM expected counts are equality-tested against an
independent in-test forward-backward implementation; encode has
coverage/identity/determinism property tests (tests/test_unigram.py).

Reference parity: justrach/pathik has no tokenizer; training-data
surface (SURVEY training-data family, beside operators/bpe.py).
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathik_spark.operators.bpe import BPE_TRAIN_MAX_WORDS, word_counts
from pathik_spark.operators.dedup import normalized_text

MAX_PIECE_LEN = 8
SEED_FACTOR = 4  # seed vocab = SEED_FACTOR * vocab_size candidates
EM_ITERS = 2  # per prune round (SentencePiece default)
PRUNE_FRAC = 0.25  # drop this fraction of worst pieces per round
_NEG_INF = float("-inf")


def seed_pieces(
    counts: Iterable[tuple[str, int]],
    n_seed: int,
    max_piece_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Candidate pieces from the word dictionary: every substring up to
    ``max_piece_len``, scored by summed word count x length (longer
    common substrings are worth more), top ``n_seed`` kept — plus ALL
    single characters (coverage guarantee). Returns piece -> initial
    count mass."""
    sub: dict[str, float] = {}
    chars: set[str] = set()
    for w, n in counts:
        chars.update(w)
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                sub[p] = sub.get(p, 0.0) + float(n) * (j - i)
    multi = {p: c for p, c in sub.items() if len(p) > 1}
    top = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[: max(0, n_seed)]
    out = {c: sub.get(c, 1.0) for c in chars}
    out.update(top)
    return out


def _forward_backward(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word under the unigram model
    (posterior over all segmentations) + the word's log-likelihood.
    Standard lattice forward-backward in log space."""
    L = len(word)
    fwd = [_NEG_INF] * (L + 1)
    fwd[0] = 0.0
    for j in range(1, L + 1):
        acc = _NEG_INF
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is None or fwd[i] == _NEG_INF:
                continue
            x = fwd[i] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        fwd[j] = acc
    if fwd[L] == _NEG_INF:
        return {}, _NEG_INF
    bwd = [_NEG_INF] * (L + 1)
    bwd[L] = 0.0
    for i in range(L - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == _NEG_INF:
                continue
            x = bwd[j] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        bwd[i] = acc
    total = fwd[L]
    exp: dict[str, float] = {}
    for i in range(L):
        if fwd[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == _NEG_INF:
                continue
            post = math.exp(fwd[i] + lp + bwd[j] - total)
            if post > 0.0:
                p = word[i:j]
                exp[p] = exp.get(p, 0.0) + post
    return exp, total


def _em_round(
    words: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, float]:
    """One EM iteration over the dictionary: expected counts weighted
    by word frequency, renormalized to log-probabilities."""
    counts: dict[str, float] = {}
    for w, n in words:
        exp, ll = _forward_backward(w, logp, max_piece_len)
        if ll == _NEG_INF:
            continue
        for p, c in exp.items():
            counts[p] = counts.get(p, 0.0) + c * n
    total = sum(counts.values())
    if total <= 0.0:
        return logp
    floor = math.log(1e-12)
    return {
        p: max(math.log(c / total), floor)
        for p, c in counts.items()
        if c > 0.0 or len(p) == 1
    }


def unigram_model_from_counts(
    counts: Iterable[tuple[str, int]],
    vocab_size: int = 8000,
    max_piece_len: int = MAX_PIECE_LEN,
    em_iters: int = EM_ITERS,
    prune_frac: float = PRUNE_FRAC,
) -> dict[str, float]:
    """The driver-side trainer: seed -> (EM x em_iters -> prune) until
    the vocabulary fits ``vocab_size``; one final EM pass. Single-char
    pieces are never pruned (any string stays encodable). Returns
    piece -> log-probability."""
    words = [(w, int(n)) for w, n in counts if w]
    seed = seed_pieces(words, SEED_FACTOR * vocab_size, max_piece_len)
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    while True:
        for _ in range(em_iters):
            logp = _em_round(words, logp, max_piece_len)
        multi = [(p, lp) for p, lp in logp.items() if len(p) > 1]
        n_over = len(logp) - vocab_size
        if n_over <= 0 or not multi:
            break
        n_drop = min(len(multi), max(n_over, int(len(multi) * prune_frac)))
        # lowest probability first; ties drop the lexicographically
        # LARGER piece (keep 'ab' over 'zz' at equal mass)
        multi.sort(key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0]]))
        for p, _ in multi[:n_drop]:
            del logp[p]
    logp = _em_round(words, logp, max_piece_len)
    return logp


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 8000,
    text_col: str = "text",
    max_words: int = BPE_TRAIN_MAX_WORDS,
    max_piece_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Distributed word count (the shared, oracled stage) -> driver
    EM/prune loop. Deterministic end to end."""
    top = (
        word_counts(docs, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    return unigram_model_from_counts(
        ((r["word"], r["n"]) for r in top),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
    )


def viterbi_encode(
    word: str, logp: dict[str, float], max_piece_len: int = MAX_PIECE_LEN
) -> list[str]:
    """Max-likelihood segmentation; ties prefer FEWER pieces, then the
    lexicographically smaller piece sequence (fully deterministic).
    Characters absent from the model fall back to singleton pieces
    (log-prob floor), so every string encodes."""
    L = len(word)
    floor = math.log(1e-12)
    best: list[tuple[float, int, tuple[str, ...]]] = [
        (0.0, 0, ())
    ] + [(_NEG_INF, 0, ())] * L
    for j in range(1, L + 1):
        cand = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i][0] == _NEG_INF:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = floor  # unseen single char
            score = best[i][0] + lp
            key = (score, -(best[i][1] + 1))
            if cand is None or key > (cand[0], -cand[1]) or (
                key == (cand[0], -cand[1])
                and best[i][2] + (piece,) < cand[2]
            ):
                cand = (score, best[i][1] + 1, best[i][2] + (piece,))
        best[j] = cand if cand is not None else (_NEG_INF, 0, ())
    return list(best[L][2])


def unigram_encode(
    docs: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(doc_id, tokens, n_unigram_tokens): scan-local Viterbi encoding
    with a per-batch word memo — bpe_encode's plan shape; the JVM-side
    normalized_text keeps trainer and encoder tokenization identical."""
    frozen = dict(model)

    def enc(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for norm in pdf["_norm"]:
                toks: list[str] = []
                if isinstance(norm, str) and norm:
                    for w in norm.split(" "):
                        got = memo.get(w)
                        if got is None:
                            got = memo[w] = viterbi_encode(
                                w, frozen, max_piece_len
                            )
                        toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks_col})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        normalized_text(F.col(text_col)).alias("_norm"),
    ).mapInPandas(enc, schema)
    return out.withColumn("n_unigram_tokens", F.size("tokens"))
