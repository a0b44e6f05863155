"""Text-analysis column functions for training-data pipelines: language
ID, quality scoring, token counting, document fingerprinting.

All are built-in-expression compositions (codegen'd; no Python in the
hot path) written with portable primitives (regexp counts, split,
md5) so each has an exact DuckDB-oracle twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.functions.text_constants import (
    BPE_TOKEN_RE,
    JA_CLASS,
    LANG_MARKERS,
    LANG_TIE_PRIORITY,
    PUNCT_CLASS,
)
from pathik_spark.operators.dedup import normalized_text, portable_hash64


def lang_scores(text_col):
    """Marker-hit counts per language, normalized by token count."""
    toks = token_count(text_col)
    return {
        lang: F.regexp_count(F.lower(text_col), F.lit(pattern)) for lang, pattern in LANG_MARKERS.items()
    }, F.regexp_count(text_col, F.lit(JA_CLASS)), toks


def lang_id(text_col):
    """Heuristic language ID: ja if CJK chars present; else the marker
    language with the most hits, ties broken by LANG_TIE_PRIORITY (de >
    en > es > fr — the same precedence the oracle's CASE chain encodes);
    'und' when nothing matches."""
    scores, ja_hits, _ = lang_scores(text_col)
    pairs = [
        F.struct(
            cnt.alias("n"),
            F.lit(LANG_TIE_PRIORITY[lang]).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for lang, cnt in scores.items()
    ]
    best = F.greatest(*pairs)
    return (
        F.when(ja_hits > 0, F.lit("ja"))
        .when(best["n"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def token_count(text_col):
    """Whitespace tokenization count (empty-safe)."""
    norm = normalized_text(text_col)
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def bpe_ish_token_count(text_col):
    """BPE-flavored proxy: count of word pieces + digits runs + punct
    singletons (a regex over the text; deterministic, portable)."""
    return F.regexp_count(text_col, F.lit(BPE_TOKEN_RE))


def quality_score(text_col):
    """[0,1] quality heuristic from length, punctuation ratio, stopword
    ratio, mean word length — the standard web-text filters, all as one
    expression. Rounded to 6 dp for cross-engine comparability."""
    n_chars = F.length(text_col)
    n_tokens = token_count(text_col)
    n_punct = F.regexp_count(text_col, F.lit(PUNCT_CLASS))
    n_stop = F.regexp_count(F.lower(text_col), F.lit(LANG_MARKERS["en"]))
    len_score = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    punct_ratio = n_punct.cast("double") / (n_chars.cast("double") + F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * F.lit(5.0))
    stop_score = F.least(
        n_stop.cast("double") * F.lit(10.0) / (n_tokens.cast("double") + F.lit(1.0)),
        F.lit(1.0),
    )
    mean_wlen = (n_chars.cast("double") + F.lit(1.0)) / (n_tokens.cast("double") + F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_score * F.lit(0.4) + punct_score * F.lit(0.2) + stop_score * F.lit(0.2) + wlen_score * F.lit(0.2),
        6,
    )


def pii_scrub(text_col):
    """Redact emails / IPv4s / phone-ish digit runs with typed tokens
    (<EMAIL>/<IP>/<PHONE>) — the standard pre-training scrub pass, as a
    chain of codegen'd regexp_replace (no Python). Patterns and their
    order are the shared constants in text_constants.PII_PATTERNS; the
    DuckDB oracle renders the same chain, so both engines apply the
    identical automatons in the identical order."""
    from pathik_spark.functions.text_constants import PII_PATTERNS

    out = text_col
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def doc_fingerprint(text_col):
    """Content fingerprint: md5 of normalized text (exact-dup key)."""
    return F.md5(normalized_text(text_col))


def rolling_fingerprint(text_col, window: int = 8):
    """Shift-resistant fingerprint: min over rolling word-window hashes
    (a 1-perm minhash over shingles) — portable md5-based hash."""
    toks = F.split(normalized_text(text_col), " ")
    n = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    shingle = lambda i: F.concat_ws(
        " ", F.slice(toks, i + 1, window)
    )
    hashes = F.transform(F.sequence(F.lit(0), n - 1), lambda i: portable_hash64(shingle(i)))
    return F.array_min(hashes)
