"""pathik_spark — a PySpark-native crawl-analytics engine.

Brand-new implementation of the capabilities of justrach/pathik
(reference snapshot at /root/reference, studied for behavior only),
re-expressed Spark-first: DataFrame/SQL plans, vectorized Arrow UDFs,
explicit host-hash partitioning, AQE skew handling, and a round-based
frontier driver with checkpoint/resume. See SURVEY.md for the design.
"""

__version__ = "0.1.0"
