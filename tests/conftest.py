import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from frog_spark.session import get_spark

    s = get_spark("frog_spark_tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pipeline():
    from frog_spark.plans.pipeline import FrogPipeline

    return FrogPipeline.build()


@pytest.fixture(scope="session")
def gold():
    from frog_spark.sources.resources import load_gold_corpus

    return load_gold_corpus()
