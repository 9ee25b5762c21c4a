import os
import shutil
import tempfile

import pytest

from pyspark_playground_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        app_name="pyspark_playground_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=warehouse,
    )
    yield s
    s.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
