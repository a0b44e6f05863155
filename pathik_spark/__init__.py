"""pathik_spark — a PySpark-native crawl-analytics engine.

Brand-new implementation of the capabilities of justrach/pathik
(reference snapshot at /root/reference, studied for behavior only),
re-expressed Spark-first: DataFrame/SQL plans, vectorized Arrow UDFs,
explicit host-hash partitioning, AQE skew handling, and a round-based
frontier driver with checkpoint/resume. See SURVEY.md for the design.
"""

__version__ = "0.1.0"

_FACADE = (
    "crawl",
    "crawl_to_r2",
    "crawl_to_warc",
    "stream_to_kafka",
    "prepare_training_corpus",
    "dedup_corpus",
    "search_corpus",
)


def __getattr__(name):
    # one-call facade (reference pathik/__init__.py surface), imported
    # lazily so `import pathik_spark` stays free of pyspark import cost
    if name in _FACADE:
        from pathik_spark import api

        return getattr(api, name)
    raise AttributeError(f"module 'pathik_spark' has no attribute {name!r}")
