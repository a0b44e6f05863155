"""Unicode script profiling — the writing-system signal.

Language ID (functions/text.lang_id, operators/langid_ml) answers
"which language"; this answers the cheaper, more robust question
"which writing system" — counts of characters per major Unicode
script block. A multilingual corpus builder needs it three ways:

- as the *coarse router* in front of per-script language ID models
  (the fastText-style NB model needs different gram inventories for
  Cyrillic vs CJK — CCNet routes exactly this way);
- as a *mojibake/mis-decode tripwire*: a page whose HTTP headers say
  Russian but whose bytes profile as Latin was decoded wrong
  (functions/mojibake.py repairs what this flags);
- as a *mixed-script spam signal*: Latin text salted with Cyrillic
  look-alikes (confusable-character keyword stuffing) shows up as a
  two-script profile with an anomalous minority fraction.

Everything is ``regexp_count`` over single-character classes — pure
codegen'd expressions in the page scan, no UDF, no shuffle. Dominant
script ties break by the fixed listing order (struct-greatest with a
priority rank; the DuckDB twin states the same rule as a CASE chain).
The dominant fraction is integer micro units over *scripted* chars
only (digits/punctuation are no script), '' profiles as 'unknown'.

Reference parity: justrach/pathik stores raw bytes with no text
analysis (SURVEY training-data family; sibling of lang_id and
nfc_normalize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# (name, single-char class) — listing order IS the tie-break priority.
# Latin includes the Latin-1/Extended letter supplements; kana covers
# hiragana + katakana; han is the BMP CJK Unified block.
SCRIPT_CLASSES = [
    ("latin", r"[A-Za-zÀ-ɏ]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("han", r"[一-鿿]"),
    ("arabic", r"[؀-ۿ]"),
    ("greek", r"[Ͱ-Ͽ]"),
    ("hangul", r"[가-힯]"),
    ("devanagari", r"[ऀ-ॿ]"),
    ("kana", r"[぀-ヿ]"),
]


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_<script>..., script, script_frac_micro) per document.

    ``script`` is the dominant writing system ('unknown' when no
    scripted characters); ``script_frac_micro`` = floor(1e6 ·
    dominant/scripted) — 1e6 means single-script, mid values flag
    mixed-script pages.
    """
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat))
        for name, pat in SCRIPT_CLASSES
    }
    out = docs.select(
        F.col(id_col).alias(id_col),
        *[c.alias(f"n_{n}") for n, c in counts.items()],
    )
    total = None
    for name, _ in SCRIPT_CLASSES:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    dom = F.greatest(
        *[
            F.struct(
                F.col(f"n_{name}").alias("c"),
                F.lit(-i).alias("p"),
                F.lit(name).alias("s"),
            )
            for i, (name, _) in enumerate(SCRIPT_CLASSES)
        ]
    )
    script = F.when(total == 0, F.lit("unknown")).otherwise(dom.getField("s"))
    frac = F.when(total == 0, F.lit(0)).otherwise(
        F.floor(F.lit(MICRO) * dom.getField("c") / total)
    )
    return out.select(
        id_col,
        *[f"n_{name}" for name, _ in SCRIPT_CLASSES],
        script.alias("script"),
        frac.cast("bigint").alias("script_frac_micro"),
    )
