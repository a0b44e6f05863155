"""Content-type sniffing by magic bytes over the pages `html` binary
column (the crawl-side complement of the sink's declared-type selection,
SURVEY.md §2.2 F5): real crawls carry mislabeled Content-Type headers,
so routing media vs markup vs archives must read the payload.

One pure JVM expression: hex the first 8 bytes and walk a fixed
longest-prefix-first decision chain — no UDF, no shuffle, evaluates
inside the scan task (whole-stage codegen) at any corpus size. The
DuckDB oracle states the identical chain over `substr(hex(blob), ...)`
(DuckDB cannot slice blobs, but hex-then-slice is byte-equivalent).

Labels cover the formats the multimodal pipeline routes on
(kernels/media.py decoders + gzip/zip/pdf containers); `markup` is any
payload opening with '<' (HTML/XML/SVG); everything else is `other`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (hex prefix of the payload's first bytes, label) — longest first;
#: '3C' ('<') last so real magic numbers win over markup.
MAGIC_PREFIXES: list[tuple[str, str]] = [
    ("89504E47", "png"),
    ("25504446", "pdf"),
    ("504B0304", "zip"),
    ("47494638", "gif"),
    ("52494646", "riff"),
    ("FFD8FF", "jpeg"),
    ("1F8B", "gzip"),
    ("3C", "markup"),
]


def sniff_content_type(bin_col: Column) -> Column:
    """Label a binary payload by magic bytes: png/pdf/zip/gif/riff/
    jpeg/gzip/markup/mp4/other, '' -> 'empty', NULL -> NULL.

    ISO-BMFF is the one non-prefix magic ('ftyp' at byte 5 — bytes 1-4
    are the ftyp box size), checked after every prefix in the chain."""
    hexp = F.hex(F.substring(bin_col, 1, 8))
    out = F.when(
        F.substring(hexp, 9, 8) == "66747970", F.lit("mp4")
    ).otherwise(F.lit("other"))
    for prefix, label in reversed(MAGIC_PREFIXES):
        out = F.when(hexp.startswith(prefix), F.lit(label)).otherwise(out)
    out = F.when(F.length(bin_col) == 0, F.lit("empty")).otherwise(out)
    return F.when(bin_col.isNull(), F.lit(None).cast("string")).otherwise(out)
