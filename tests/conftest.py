from __future__ import annotations

import pytest

from pathik_spark.fixtures import corpus_to_spark, gen_corpus
from pathik_spark.session import get_spark

N_PAGES = 2000
N_SEEDS = 200


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pathik_spark_tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def corpus_pd():
    return gen_corpus(N_PAGES, N_SEEDS)


@pytest.fixture(scope="session")
def corpus(spark, corpus_pd):
    dfs = corpus_to_spark(spark, corpus_pd)
    for df in dfs.values():
        df.cache().count()
    return dfs
