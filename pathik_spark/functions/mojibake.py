"""Mojibake (encoding-damage) detection and repair for web text.

The dominant real-world corruption: a page was UTF-8, but some layer
decoded it as Windows-1252/Latin-1 — ``é`` becomes ``Ã©``, ``’``
becomes ``â€™``, ``€`` becomes ``â‚¬``. At corpus scale this is a
quality gate (mojibake correlates with broken pipelines upstream) and a
repair opportunity: the damage is a deterministic, invertible byte map,
so the fix is exact, not a heuristic.

Everything is generated from first principles at import time, not a
hand-typed table: for each curated target character ``c``, the damaged
form is ``c.encode('utf-8')`` re-decoded as *sloppy* cp1252 (cp1252
with the five undefined bytes 0x81/0x8D/0x8F/0x90/0x9D falling back to
their Latin-1 control chars — the same convention ftfy documents,
reimplemented here from the codec definition). Repair is the inverse
replace, applied longest-damaged-form-first so multi-byte sequences
win over their prefixes.

Plan shape: detection and repair are pure scan-local string
expressions (chained ``replace`` + length arithmetic — whole-stage
codegen, no UDFs, no shuffle), so the gate rides the same corpus scan
as every other quality signal. The identical replace chain renders to
DuckDB SQL from the same generated table (entry_queries.
duck_mojibake_sql), so the twins cannot drift.

Single-pass repair by design: doubly-encoded text (``CafÃƒÂ©``) repairs
one layer per application; ``repair_mojibake(col, passes=2)`` unwinds
two layers, which covers everything observed in practice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Repair targets, generated rather than hand-typed: the ENTIRE Latin-1
# supplement (U+00A0 nbsp through U+00FF — every Western-European
# letter, sign, and the very common damaged-nbsp 'Â '), plus the cp1252
# punctuation block (curly quotes, dashes, €, ™, Š/Œ/Ž families).
# These are exactly the 2-byte-UTF-8 chars whose mis-decoding yields
# the familiar Ã/Â digraphs and the 3-byte ones yielding â€-triplets.
_TARGETS = "".join(chr(cp) for cp in range(0xA0, 0x100)) + (
    "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
)


def _sloppy_cp1252_decode(bs: bytes) -> str:
    """cp1252 with the 5 undefined bytes mapped to their Latin-1
    control chars — how lenient real-world decoders behave."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def _build_table() -> list[tuple[str, str]]:
    pairs = []
    for c in _TARGETS:
        bad = _sloppy_cp1252_decode(c.encode("utf-8"))
        if bad != c:
            pairs.append((bad, c))
    # longest damaged form first: 3-byte sequences (â€™ …) repair before
    # any 2-byte prefix could touch their tail
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return pairs


MOJIBAKE_TABLE: list[tuple[str, str]] = _build_table()

def mojibake_score(col: Column) -> Column:
    """Damage weight = ``length(text) - length(repair(text))`` (int; 0
    for clean text, NULL for NULL). Exact by construction — the repair
    chain is a no-op on clean text, so there are no marker-heuristic
    false positives; each damaged 2-byte char contributes 1, each
    3-byte char 2."""
    return (F.length(col) - F.length(repair_mojibake(col))).cast("int")


def is_mojibake(col: Column, min_score: int = 1) -> Column:
    """Boolean gate: damage weight at least ``min_score``."""
    return mojibake_score(col) >= F.lit(min_score)


def repair_mojibake(col: Column, passes: int = 1) -> Column:
    """Invert the UTF-8-read-as-cp1252 damage with the generated
    replace chain (longest form first). ``passes=2`` also unwinds
    doubly-encoded text. Clean text is a no-op by construction — every
    damaged form contains a byte sequence that cannot occur in
    well-formed Western text."""
    out = col
    for _ in range(passes):
        for bad, good in MOJIBAKE_TABLE:
            out = F.replace(out, F.lit(bad), F.lit(good))
    return out
