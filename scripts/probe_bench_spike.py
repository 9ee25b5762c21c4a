#!/usr/bin/env python
"""Replay the bench's query order, recording EVERY execution sample
(not the median) plus JVM heap and block-manager state after each, to
locate the intermittent ~10 s spike seen on one minhash-family line per
bench run (r11 verification runs: run3 day-2 13.3 s, verify1
minhash_lsh 10.2 s).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_bench_spike.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.session import get_spark


def jvm_stats(spark):
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    sc = spark.sparkContext
    status = sc._jsc.sc().getExecutorMemoryStatus()
    # RDD storage info via the status tracker
    n_persist = sc._jsc.sc().getPersistentRDDs().size()
    return round(used), n_persist


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="probe_bench_spike",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": "65536",
        },
    )
    registry = Q.queries()
    names = [n for n in B.HEADLINE if n in registry]
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100).write.format(
        "noop"
    ).mode("overwrite").save()
    t_start = time.time()
    for name in names:
        fn = registry[name]
        samples = []
        for i in range(4):  # warm-up + 3 timed, same as bench
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        heap_mb, n_persist = jvm_stats(spark)
        print(
            json.dumps(
                {
                    "q": name,
                    "samples": samples,
                    "t_offset": round(time.time() - t_start, 1),
                    "heap_mb": heap_mb,
                    "persisted_rdds": n_persist,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
