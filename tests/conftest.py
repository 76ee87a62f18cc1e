import pytest


@pytest.fixture(scope="session")
def spark():
    from knowledgeextraction_spark.session import get_spark

    s = get_spark("sparkkg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from knowledgeextraction_spark.fixtures.generator import generate_corpus

    return generate_corpus(n_pages=60, seed=42)
