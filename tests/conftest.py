import pytest

from peregrine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="peregrine_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def edges_df(spark, pairs):
    """Canonical (src<dst) integer edge DataFrame from an iterable of pairs."""
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    return spark.createDataFrame(canon, "src long, dst long")
