import pytest

from auto_archiver_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="aas-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
