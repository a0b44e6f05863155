"""Indexed binary token-dataset sink (Megatron/Fairseq ``.bin``/``.idx``).

The JSONL exports (sources/sinks.py) feed tokenizers; pretraining
loaders, though, consume TOKENIZED datasets in the memory-mappable
indexed format popularized by Fairseq's ``MMapIndexedDataset`` and
used verbatim by Megatron-LM's data pipeline: a flat ``.bin`` of
token ids plus an ``.idx`` sidecar with per-sequence sizes and byte
pointers, so a loader can mmap the shard and slice sequence *i*
without parsing anything. This module writes that layout from a
DataFrame of token-id arrays — the last hop from this engine to a
trainer — and reads it back for verification.

Format (public, interchange-stable):

    .idx: magic ``MMIDIDX\\x00\\x00`` | version u64=1 | dtype-code u8
          | n_sequences u64 | n_docs u64
          | sizes  i32[n_sequences]   (token count per sequence)
          | pointers u64-aligned i64[n_sequences] (byte offset in .bin)
          | doc_idx i64[n_docs]       (cumulative sequence index per
                                       document boundary, starts at 0)
    .bin: token ids, little-endian, concatenated.

dtype is uint16 when the vocabulary fits (the GPT-2/LLaMA-size case —
half the bytes), int32 otherwise; the code byte follows the shared
table (1 u8, 2 i8, 3 i16, 4 i32, 5 i64, 6 f32, 7 f64, 8 u16).

Scale shape: shard membership is the same deterministic
``portable_hash64 % n_shards`` lattice as write_sharded_jsonl (stable
across runs and clusters), rows sort within partitions, and each task
streams its shard's ids straight to disk — no shuffle beyond the one
repartition, no driver collect, one ``.bin``/``.idx`` pair per shard
named by the shard label (idempotent under task retry: files reopen
``wb``).

Reference parity: justrach/pathik ends at stored pages (storage.go);
trainer-ready export is part of the corpus-build surface this engine
adds (SURVEY.md training-data family).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MMIDIDX\x00\x00"
VERSION = 1
DTYPE_CODES = {
    1: np.uint8, 2: np.int8, 3: np.int16, 4: np.int32,
    5: np.int64, 6: np.float32, 7: np.float64, 8: np.uint16,
}
_CODE_OF = {np.dtype(v): k for k, v in DTYPE_CODES.items()}


def token_dtype(vocab_size: int | None) -> np.dtype:
    """uint16 when every id fits, else int32 — Megatron's own rule."""
    if vocab_size is not None and vocab_size <= (1 << 16):
        return np.dtype(np.uint16)
    return np.dtype(np.int32)


def pack_index(sizes: list[int], itemsize: int, dtype_code: int) -> bytes:
    """Serialize the .idx sidecar for one shard (sizes in tokens)."""
    n = len(sizes)
    sizes_arr = np.asarray(sizes, dtype=np.int32)
    pointers = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(sizes_arr[:-1] * itemsize, out=pointers[1:])
    doc_idx = np.arange(n + 1, dtype=np.int64)  # one document per sequence
    head = MAGIC + struct.pack("<QBQQ", VERSION, dtype_code, n, n + 1)
    return (
        head
        + sizes_arr.tobytes()
        + pointers.tobytes()
        + doc_idx.tobytes()
    )


def read_indexed_dataset(path_prefix: str) -> list[np.ndarray]:
    """Read ``{path_prefix}.idx`` + ``.bin`` back into per-sequence id
    arrays — the verification-side inverse of the sink."""
    with open(path_prefix + ".idx", "rb") as f:
        raw = f.read()
    if raw[: len(MAGIC)] != MAGIC:
        raise ValueError(f"bad magic in {path_prefix}.idx")
    off = len(MAGIC)
    version, code, n, n_docs = struct.unpack_from("<QBQQ", raw, off)
    if version != VERSION:
        raise ValueError(f"unsupported version {version}")
    dtype = np.dtype(DTYPE_CODES[code])
    off += struct.calcsize("<QBQQ")
    sizes = np.frombuffer(raw, dtype=np.int32, count=n, offset=off)
    off += 4 * n
    pointers = np.frombuffer(raw, dtype=np.int64, count=n, offset=off)
    off += 8 * n
    doc_idx = np.frombuffer(raw, dtype=np.int64, count=n_docs, offset=off)
    if n and (doc_idx[0] != 0 or doc_idx[-1] != n):
        raise ValueError("inconsistent doc index")
    data = np.fromfile(path_prefix + ".bin", dtype=dtype)
    out = []
    for i in range(n):
        start = pointers[i] // dtype.itemsize
        out.append(data[start : start + sizes[i]])
    return out


def write_indexed_token_shards(
    df: DataFrame,
    out_dir: str,
    prefix: str = "tokens",
    ids_col: str = "token_ids",
    key_col: str = "doc_id",
    n_shards: int = 8,
    vocab_size: int | None = None,
) -> list:
    """Write (key, token_ids array) rows as ``n_shards`` ``.bin/.idx``
    pairs under ``out_dir``. Membership = portable_hash64(key) %
    n_shards (re-runs reproduce identical shards); within a shard,
    sequences appear in ``key_col`` order. Returns per-shard summary
    rows (path, n_docs, n_tokens) — small, #shards of them."""
    from pathik_spark.operators.dedup import portable_hash64

    dtype = token_dtype(vocab_size)
    code = _CODE_OF[dtype]
    lo, hi = 0, np.iinfo(dtype).max
    os.makedirs(out_dir, exist_ok=True)
    width = max(5, len(str(n_shards - 1)))
    shard = F.lpad(
        F.pmod(
            portable_hash64(
                F.concat(F.lit("tokshard:"), F.col(key_col).cast("string"))
            ),
            F.lit(n_shards),
        ).cast("string"),
        width,
        "0",
    )
    src = (
        df.select(
            shard.alias("_shard"),
            F.col(key_col).alias("_key"),
            F.col(ids_col).alias("_ids"),
        )
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def writer(batches):
        open_shard = None
        f = None
        sizes: list[int] = []

        def finish():
            nonlocal f
            if f is None:
                return None
            f.close()
            f = None
            base = os.path.join(out_dir, f"{prefix}-{open_shard}")
            with open(base + ".idx", "wb") as idx:
                idx.write(pack_index(sizes, dtype.itemsize, code))
            return (base, len(sizes), int(sum(sizes)))

        rows = []
        for pdf in batches:
            for sh, ids in zip(pdf["_shard"], pdf["_ids"]):
                if sh != open_shard:
                    done = finish()
                    if done is not None:
                        rows.append(done)
                    open_shard = sh
                    sizes = []
                    f = open(
                        os.path.join(out_dir, f"{prefix}-{sh}.bin"), "wb"
                    )
                arr = np.asarray(ids, dtype=np.int64)
                if arr.size and (arr.min() < lo or arr.max() > hi):
                    raise ValueError(
                        f"token id outside {dtype} range in shard {sh}"
                    )
                arr = arr.astype(dtype)
                f.write(arr.tobytes())
                sizes.append(int(arr.size))
        done = finish()
        if done is not None:
            rows.append(done)
        yield pd.DataFrame(rows, columns=["path", "n_docs", "n_tokens"])

    return src.mapInPandas(writer, schema).collect()
