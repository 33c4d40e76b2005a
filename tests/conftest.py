import pytest

from lsearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="lsearch-tests", cores=8, shuffle_partitions=8, driver_memory="4g")
    yield s
    s.stop()
