import os
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _load_slow_entries():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    files, tests = set(), set()
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if "::" in line:
                    tests.add(tuple(line.split("::", 1)))
                else:
                    files.add(line)
    except OSError:
        pass
    return files, tests


_SLOW_FILES, _SLOW_TESTS = _load_slow_entries()


def pytest_collection_modifyitems(config, items):
    # Mark the long-running tests listed in slow_tests.txt so the
    # default selection (addopts -m "not slow") stays inside an
    # external verification window. Parameterized variants share their
    # base name. Full suite: -m ""; slow set only: -m slow.
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = re.sub(r"\[.*\]$", "", item.name)
        if fname in _SLOW_FILES or (fname, base) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


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
