"""Unicode normalization for web text (NFC/NFKC/NFD/NFKD + control
strip): crawled pages mix precomposed and combining-mark encodings of
the same visible text, which breaks exact/line/substring dedup keys and
tokenizer vocab hits; normalizing first makes byte equality mean text
equality.

The JVM has no normalization expression, so this is the sanctioned slow
path: ONE Arrow-batched pandas UDF (never row-at-a-time Python),
scan-local — no shuffle, and the Python cost is a single pass per
string. At 100 TB this runs inside the same scan that feeds the dedup
hash, adding no plan structure.

Verification is two INDEPENDENT implementations meeting: the operator
uses CPython's unicodedata (UCD tables) while the DuckDB oracle uses
utf8proc's nfc_normalize — agreement over the composition corpus is
evidence neither transliterated the other.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

#: C0/C1 controls except \t \n \r — crawl payloads carry stray controls
#: that poison tokenizers and JSONL sinks.
_CONTROL = {c: None for c in range(0x00, 0x20) if c not in (0x09, 0x0A, 0x0D)}
_CONTROL.update({c: None for c in range(0x7F, 0xA0)})


def normalize_unicode(col: Column, form: str = "NFC", strip_controls: bool = False) -> Column:
    """Normalize a string column to the given Unicode form (optionally
    dropping C0/C1 control chars). NULL passes through."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            out = unicodedata.normalize(form, x)
            return out.translate(_CONTROL) if strip_controls else out

        return s.map(one)

    return _norm(col)
