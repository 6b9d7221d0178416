import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests don't need 32 threads


@pytest.fixture(scope="session")
def spark():
    from cloudtiff_spark.session import get_spark

    s = get_spark("cloudtiff-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small():
    from cloudtiff_spark.fixtures import ensure_fixtures

    return ensure_fixtures("sf0.001")
