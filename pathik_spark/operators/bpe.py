"""BPE tokenizer TRAINING and encoding over the corpus.

Scale shape: BPE training never needs the corpus — it needs the WORD
FREQUENCY dictionary, which is bounded (zipf: ~10^6-10^7 distinct words
even at 100 TB) while the corpus is not. So the trainer is:

  1. ONE distributed pass: normalize -> split -> explode -> groupBy
     word count (map-side partial agg; the only shuffle), keep the
     top ``max_words`` by (count desc, word) — bounded driver
     transfer, deterministic under any partitioning.
  2. The classic merge loop runs DRIVER-SIDE over that dictionary
     (pair counts weighted by word frequency), which is exact — BPE
     pair statistics are a linear function of word counts. Ties break
     (count desc, pair lexicographic): fully deterministic, no RNG.

Encoding back over the corpus is scan-local: a pandas UDF applies the
ordered merge list per DISTINCT word once per Arrow batch (word->tokens
memo), so hot words cost O(1) — no shuffle, no driver round trip.

Verification: the distributed stage (word counts) is DuckDB-oracled
(`bpe_word_counts`); the merge loop + encoder are equality-tested
against an independent pure-Python reference implementation
(tests/test_bpe.py), the same sim-oracle pattern as the scheduler.

Reference parity: justrach/pathik has no tokenizer; this is
training-data-pipeline surface (functions/text.token_count does the
whitespace/BPE-ish costing; this gives real learned subwords).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathik_spark.operators.dedup import normalized_text

#: end-of-word marker (suffix style keeps round-trip arithmetic simple)
EOW = "</w>"

BPE_TRAIN_MAX_WORDS = 1 << 17


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the one distributed stage of BPE training. Map-side
    partial aggregation collapses each partition's zipf head before the
    single shuffle; blank rows contribute nothing."""
    norm = normalized_text(F.col(text_col))
    return (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply one merge to a symbol tuple: all non-overlapping
    occurrences, leftmost first (standard BPE)."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_merges_from_counts(
    counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The classic merge loop over a word-frequency dictionary.
    Deterministic: pair score = summed word counts; ties break to the
    lexicographically smallest pair. Stops early when no pair remains
    (fully merged dictionary)."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in counts:
        sym = tuple(w) + (EOW,)
        words[sym] = words.get(sym, 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        rebuilt: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            m = _merge_word(sym, best)
            rebuilt[m] = rebuilt.get(m, 0) + n
        words = rebuilt
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    max_words: int = BPE_TRAIN_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Distributed word count -> driver merge loop. ``max_words`` caps
    the dictionary at the top (count desc, word) rows — the truncation
    is deterministic and, under zipf, drops only the counts that cannot
    change early merges."""
    top = (
        word_counts(docs, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    return bpe_merges_from_counts(((r["word"], r["n"]) for r in top), n_merges)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word by replaying the merge list in training order
    (the standard, deterministic inference rule)."""
    sym: tuple[str, ...] = tuple(word) + (EOW,)
    for pair in merges:
        if len(sym) == 1:
            break
        sym = _merge_word(sym, pair)
    return list(sym)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, tokens array<string>, n_bpe_tokens): scan-local subword
    encoding. The merge list ships as a UDF closure (a few KB-MB); a
    per-batch word memo makes hot words O(1).

    Normalization happens in the JVM plan via the SAME normalized_text
    expression the trainer's word_counts stage uses — the UDF only
    splits on single spaces. A Python re-implementation here would risk
    silent tokenization drift (locale/Unicode case-mapping differences)
    producing words at encode time that never existed in training."""
    frozen = [tuple(p) for p in merges]

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
                            got = memo[w] = encode_word(w, frozen)
                        toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "tokens": toks_col}
            )

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
    return out.withColumn("n_bpe_tokens", F.size("tokens"))


def bpe_vocab(merges: list[tuple[str, str]], base: Iterable[str]) -> list[str]:
    """The learned vocabulary: base symbols + one new symbol per merge,
    in training order (the id-assignment order every BPE runtime uses)."""
    vocab = sorted(set(base)) + [EOW]
    seen = set(vocab)
    for a, b in merges:
        s = a + b
        if s not in seen:
            seen.add(s)
            vocab.append(s)
    return vocab
