"""Single source of truth for the text-analysis regex constants.

Both the DataFrame functions (functions/text.py) and the dual-dialect
oracle SQL (entry_queries.py) render from THESE strings, so the engine
and its DuckDB oracle can never drift on a character class (round-1
finding: the quality-score punctuation class differed between the two).

Character classes are explicit — no ``\\w``/``\\s`` — because Java
regex (Spark) and RE2 (DuckDB) disagree on corner members (e.g. \\x0B
in \\s); an explicit class means both engines compile the identical
automaton.
"""

from __future__ import annotations

# punctuation = NOT (ASCII alnum, underscore, or common whitespace)
PUNCT_CLASS = r"[^A-Za-z0-9_ \t\n\r\f]"

# BPE-flavored token pieces: short letter runs, digit runs, punct singletons
BPE_TOKEN_RE = r"[A-Za-z]{1,4}|[0-9]+|[^ \t\n\r\fA-Za-z0-9]"

# whitespace-run collapse used by normalized_text — \s+ is identical in
# Java and RE2 for the characters present in the corpus (kept for
# compatibility with the already-verified dedup family)
WS_RUN_RE = r"\s+"

# marker-word inventories for the stopword language heuristic; EN doubles
# as the quality-score stopword list
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|los|las|es|una|para|con|del|por|como)\b",
}
JA_CLASS = r"[぀-ヿ一-鿿]"

# tie-break priority when marker counts are equal (the oracle's CASE
# chain checks de first, then en, es, fr)
LANG_TIE_PRIORITY = {"de": 3, "en": 2, "es": 1, "fr": 0}

# PII redaction patterns, applied IN ORDER (emails first — they contain
# digits a later pattern could chew on; IPv4 before phone so dotted
# quads never half-match as phone digits). Explicit classes only, and
# no lookarounds — Java regex (Spark) and RE2 (DuckDB) must compile the
# identical automaton. The phone pattern is deliberately conservative
# (>= 7 chars of digits/()/-, optional leading +): redaction recall
# beats precision for training data, but mass false positives on years/
# ids are worse.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\+?[0-9][0-9()\-]{5,}[0-9]", "<PHONE>"),
)
