import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from distributed_vector_database_spark.session import get_spark

    s = get_spark(app_name="dvds-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from distributed_vector_database_spark.sources.fixtures import load_tables

    return load_tables(spark, SF_DIR)
