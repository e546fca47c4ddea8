import pytest

from online_centrality_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="oc_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
