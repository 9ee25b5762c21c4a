#!/usr/bin/env python
"""Two-decade scale probe for the two most expensive headline queries
(VERDICT r8 item 4): `entity_resolution_part` and
`ivf_pq_frozen_search_embeddings` at 1x / 10x / 100x.

Replicates the sf0.1 `part` and `embeddings` tables with shifted keys
into /tmp (testdata untouched). For `part`, each replica also shifts
`p_retailprice` into its own price decade so the (noun x price-band)
block key stays CONSTANT-SIZED as the catalog grows — the honest model
of "new products arrive" (a key-only replication would put 100
identical catalogs into the same blocks and measure the banding
artifact, not the operator; cf. SCALE.md probe 83's note).

For the frozen search, the first (untimed) call trains + memoizes the
model per directory; the timed runs measure pure serving latency —
the 100 TB-relevant number.

Usage: python scripts/probe_heavies_100x.py [factors...]  (default 1 10 100)
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
WORK = os.environ.get("HEAVY_PROBE_DIR", "/tmp/heavy_probe")


def synthesize(spark, factor: int) -> str:
    if factor == 1:
        return SF_DIR
    out_dir = f"{WORK}_{factor}x"
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    if not os.path.exists(f"{out_dir}/part.parquet"):
        part = Q.load(spark, SF_DIR, "part").crossJoin(reps)
        part = (
            part.withColumn(
                "p_partkey",
                F.col("p_partkey") + F.col("__rep") * F.lit(100_000_000),
            )
            # each replica gets its own price decade: the block key
            # (last noun | floor(price/10)) stays constant-sized as the
            # catalog grows, which is what the scale claim asserts
            .withColumn(
                "p_retailprice",
                F.col("p_retailprice") + F.col("__rep") * F.lit(100_000.0),
            )
            .drop("__rep")
        )
        part.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        emb = Q.load(spark, SF_DIR, "embeddings").crossJoin(reps)
        emb = emb.withColumn(
            "vec_id", F.col("vec_id") + F.col("__rep") * F.lit(100_000_000)
        ).drop("__rep")
        emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    return out_dir


def timed(fn, spark, sf_dir, runs=2):
    """Warm-up once (also populates the frozen-model memo), then the
    median of `runs` timed executions and the output row count."""
    n = fn(spark, sf_dir).count()
    walls = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        walls.append(time.time() - t0)
    walls.sort()
    return n, walls[len(walls) // 2]


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark()
    for factor in factors:
        sf_dir = synthesize(spark, factor)
        for name in ("entity_resolution_part",
                     "ivf_pq_frozen_search_embeddings"):
            fn = Q.QUERIES[name]
            table = "part" if "part" in name else "embeddings"
            in_rows = Q.load(spark, sf_dir, table).count()
            out_rows, wall = timed(fn, spark, sf_dir)
            print(json.dumps({
                "probe": name, "factor": factor, "input_rows": in_rows,
                "output_rows": out_rows, "sec": round(wall, 2),
                "rows_per_sec": round(in_rows / wall),
            }), flush=True)


if __name__ == "__main__":
    main()
