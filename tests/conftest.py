import pytest


@pytest.fixture(scope="session")
def spark():
    from gensim_spark.session import get_spark

    s = get_spark("gensim_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


# FIXTURES.md §3a — gensim/test/test_bm25model.py:27,46
BM25_DOCS = [["cat", "dog", "mouse"], ["cat", "lion"], ["cat", "lion"]]

# FIXTURES.md §3b — gensim/test/utils.py:195-205 common_texts
COMMON_TEXTS = [
    ["human", "interface", "computer"],
    ["survey", "user", "computer", "system", "response", "time"],
    ["eps", "user", "interface", "system"],
    ["system", "human", "system", "eps"],
    ["user", "response", "time"],
    ["trees"],
    ["graph", "trees"],
    ["graph", "minors", "trees"],
    ["graph", "minors", "survey"],
]


@pytest.fixture(scope="session")
def bm25_docs():
    return BM25_DOCS


@pytest.fixture(scope="session")
def common_texts():
    return COMMON_TEXTS


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, tokens array<string>"
    )
