import pytest


@pytest.fixture(scope="session")
def spark():
    from katydid_haskell_spark.session import get_spark

    s = get_spark("katydid-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
