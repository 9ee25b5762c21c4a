"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``pyspark_playground_spark/queries.py``; this
module is the thin driver-facing shim.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from pyspark_playground_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full Data-Vault staging→hub pipeline on the customer table and
    a pricing-summary aggregation to exercise scan, hash, anti-join-append
    and aggregate paths in one go.
    """
    sf_dir = "/root/testdata/sf0.001"
    hub = _q.QUERIES["dv_hub_customer"](spark, sf_dir)
    q1 = _q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    # cross-check both paths ran, return the aggregate (small, stable schema)
    assert hub.columns[0] == "$__HKEY"
    return q1


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return _q.oracle_sql()
