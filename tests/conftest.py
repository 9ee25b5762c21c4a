import os
import shutil
import tempfile

import pytest

from pyspark_playground_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

# test-session parallelism: the suite is one process with a session-scoped
# Spark; more local cores shorten every multi-partition stage without
# changing any plan semantics (shuffle partitions stay at 4 so shapes are
# unchanged). Override with SPARK_GRAFT_TEST_CORES.
TEST_CORES = os.environ.get("SPARK_GRAFT_TEST_CORES", "4")


@pytest.fixture(scope="session")
def spark():
    # tmpfs-backed warehouse: the suite performs hundreds of small catalog
    # writes whose cost is file commit/rename latency, not data volume —
    # /dev/shm removes the disk from that path (falls back to the default
    # tmp dir when absent)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-", dir=base)
    s = get_spark(
        app_name="pyspark_playground_spark-tests",
        master=f"local[{TEST_CORES}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4")),
        warehouse_dir=warehouse,
    )
    yield s
    s.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
