"""SparkSession factory with the engine's scale-oriented defaults.

AQE + skew-join handling are on per BASELINE.json north_rule; shuffle
partitions default to the local core count (overridable for a real
cluster via normal spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pathik_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("PATHIK_SPARK_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = int(cores) if master.startswith("local") else 256
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("PATHIK_ARROW_BATCH", "2048"),
        )
        # html:binary rows are 5-80 KB; the default 4096-row columnar batch
        # means ~250 MB live per scan task — with 32 concurrent tasks that
        # alone exceeds an 8g heap. 512 bounds scan memory at ~30 MB/task
        # regardless of core count (the knob that keeps wide-binary scans
        # safe on real executors too).
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # zstd ~3x smaller than snappy on extracted text/markdown: the
        # compress CPU is parallel, the saved bytes are serial disk/network
        # time — the right trade for write-heavy crawl rounds
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("PATHIK_PARQUET_CODEC", "zstd"),
        )
        # bucketed+sorted tables are written one-file-per-bucket (see
        # CrawlRun._prepared_pages); let the scan report that ordering so
        # sort-merge joins against them skip re-sorting the html payload
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PATHIK_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
