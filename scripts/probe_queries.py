#!/usr/bin/env python
"""Generic per-query scale probe: run named registry entries at a
replicated multiple of sf0.1 (keys shifted per replica; testdata
untouched) and print rows/sec per query — the flat-or-rising check
every new operator needs before commit.

Usage: python scripts/probe_queries.py FACTOR query [query ...]
       (FACTOR=1 runs straight off sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
WORK = os.environ.get("QUERY_PROBE_DIR", "/tmp/query_probe")

KEYS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
}


def synthesize(spark, factor: int, tables: set[str]) -> str:
    if factor == 1:
        return SF_DIR
    out_dir = f"{WORK}_{factor}x"
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    for table in tables:
        out = f"{out_dir}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = Q.load(spark, SF_DIR, table).crossJoin(reps)
        for k in KEYS[table]:
            df = df.withColumn(
                k, F.col(k) + F.col("__rep") * F.lit(100_000_000)
            )
        if table == "events":
            # shift each replica by 90 days so time-windowed operators
            # see more windows, not denser ones
            df = df.withColumn(
                "ts",
                F.col("ts")
                + F.make_interval(days=F.col("__rep") * F.lit(90)),
            )
        df = df.drop("__rep")
        df.write.mode("overwrite").parquet(out)
    return out_dir


def main() -> None:
    factor = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark()
    needed = set()
    for n in names:
        for t in KEYS:
            if n.endswith(t) or t in n:
                needed.add(t)
    # every entry touches at most these; synthesizing extra is harmless
    sf_dir = synthesize(spark, factor, needed or {"events", "documents"})
    for name in names:
        fn = Q.QUERIES[name]
        in_rows = None
        for t in sorted(needed):
            if t in name:
                in_rows = Q.load(spark, sf_dir, t).count()
                break
        if in_rows is None and needed:
            in_rows = Q.load(spark, sf_dir, sorted(needed)[0]).count()
        fn(spark, sf_dir).count()  # warm-up
        t0 = time.time()
        out_rows = fn(spark, sf_dir).count()
        wall = time.time() - t0
        print(json.dumps({
            "probe": name, "factor": factor, "input_rows": in_rows,
            "output_rows": out_rows, "sec": round(wall, 2),
            "rows_per_sec": round(in_rows / wall) if in_rows else None,
        }), flush=True)


if __name__ == "__main__":
    main()
