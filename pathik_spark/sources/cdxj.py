"""CDXJ index interchange: the Common Crawl / pywb index line format.

Common Crawl publishes its per-crawl URL index as ~300 range-sharded
``cdx-NNNNN.gz`` text files of CDXJ lines:

    <SURT key> <14-digit timestamp> {"url": ..., "filename": ...,
        "offset": "...", "length": "...", "mime": ..., "status": ...,
        "digest": ...}

(numbers are JSON *strings* in CC's encoding — kept here verbatim so
our lines are byte-compatible with CC tooling). The engine already
maintains a parquet CDX (url, path, offset, length — write_warc_files);
this module converts that index to and from the text interchange form,
so this engine can (a) publish indexes CC-ecosystem tools (pywb,
cdx-toolkit) consume and (b) QUERY a real Common Crawl index dump
relationally.

Everything is pure column expressions — SURT keys
(functions/urls.surt_key_expr), 14-digit timestamps via date_format,
JSON via to_json/get_json_object; no UDF in either direction.

Scale/layout: ``write_cdxj`` range-repartitions on (surt, ts) and
sorts within partitions — each output shard is internally sorted and
the shards form one global key order, exactly CC's layout (their
``cluster.idx`` is the shard-boundary list; the returned boundary
summary serves the same role). Reading is a plain text scan; the
binary-search use case stays with the parquet CDX, the text form is
for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathik_spark.functions.urls import surt_key_expr

TS14 = "yyyyMMddHHmmss"


def cdxj_lines(
    index: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    path_col: str = "path",
    offset_col: str = "offset",
    length_col: str = "length",
    mime_col: str | None = None,
    status_col: str | None = None,
    digest_col: str | None = None,
) -> DataFrame:
    """(surt, ts14, line) CDXJ rows from a capture index. Optional
    mime/status/digest columns land in the JSON block when given (CC
    carries them; our minimal parquet CDX does not)."""
    fields = [
        F.col(url_col).alias("url"),
        F.col(path_col).alias("filename"),
        F.col(offset_col).cast("string").alias("offset"),
        F.col(length_col).cast("string").alias("length"),
    ]
    if mime_col:
        fields.append(F.col(mime_col).alias("mime"))
    if status_col:
        fields.append(F.col(status_col).cast("string").alias("status"))
    if digest_col:
        fields.append(F.col(digest_col).alias("digest"))
    surt = surt_key_expr(F.col(url_col))
    ts14 = F.date_format(F.col(ts_col), TS14)
    return index.select(
        surt.alias("surt"),
        ts14.alias("ts14"),
        F.concat_ws(
            " ", surt, ts14, F.to_json(F.struct(*fields))
        ).alias("line"),
    )


def write_cdxj(
    lines: DataFrame, out_dir: str, n_shards: int = 4
) -> DataFrame:
    """Write CDXJ lines as ``n_shards`` internally-sorted, globally
    range-ordered text shards (gzip). Returns the per-shard key-range
    summary (the cluster.idx role): (first_key, last_key, n_lines) —
    computed from the same sorted frame, #shards rows."""
    sharded = lines.repartitionByRange(
        n_shards, F.col("surt"), F.col("ts14")
    ).sortWithinPartitions("surt", "ts14")
    sharded.select("line").write.mode("overwrite").option(
        "compression", "gzip"
    ).text(out_dir)
    key = F.concat_ws(" ", F.col("surt"), F.col("ts14"))
    return (
        sharded.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.min(key).alias("first_key"),
            F.max(key).alias("last_key"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .drop("_pid")
    )


def parse_cdxj_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ text -> relational index: (urlkey, ts, url, filename,
    offset, length, mime, status, digest). Missing JSON fields are
    NULL; offset/length/status come back typed. Pure expressions
    (split limit 3 + get_json_object) — a 300-shard CC index parses
    inside the text scan."""
    parts = F.split(F.col(line_col), " ", 3)
    js = parts.getItem(2)
    return lines.select(
        parts.getItem(0).alias("urlkey"),
        F.to_timestamp(parts.getItem(1), TS14).alias("ts"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.filename").alias("filename"),
        F.get_json_object(js, "$.offset").cast("long").alias("offset"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.status").cast("int").alias("status"),
        F.get_json_object(js, "$.digest").alias("digest"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ shards (plain or .gz — Spark's text source decodes
    gzip transparently) into the relational index shape."""
    return parse_cdxj_lines(
        spark.read.text(path).withColumnRenamed("value", "line")
    )
