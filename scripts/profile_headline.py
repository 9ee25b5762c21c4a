#!/usr/bin/env python
"""Per-query cost decomposition for the headline bench lines.

For each headline query (or the names passed on argv), measures at
$SPARK_GRAFT_SF_DIR (default sf0.1), after one untimed warm-up run:

- build_s:   wall to call ``fn(spark, sf_dir)`` — pure Python/py4j
             DataFrame-construction time (no Spark job)
- analyze_s: wall to touch ``df.schema`` — analyzer pass
- exec_s:    wall of the noop write (optimize + codegen + run)

This splits "driver-side plan cost" from "cluster work": a query whose
build_s+analyze_s rivals exec_s is bottlenecked on expression-tree
construction / planning, not on data — the round-11 optimization
question (guide §1: measure first; §7.3: planning is driver-side,
single-threaded work).

Usage: python scripts/profile_headline.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from pyspark_playground_spark import queries as Q  # noqa: E402
from pyspark_playground_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_headline",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": "65536",
        },
    )
    registry = Q.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in registry]

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100).write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        _ = df.schema
        t2 = time.time()
        spark.sparkContext.setJobDescription(f"timed {name}")
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        rows.append(
            {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "analyze_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -r["total_s"])
    print("\n=== sorted by total ===")
    for r in rows:
        print(
            f"{r['query']:45s} build {r['build_s']:7.3f}  "
            f"analyze {r['analyze_s']:7.3f}  exec {r['exec_s']:7.3f}  "
            f"total {r['total_s']:7.3f}"
        )
    print(
        json.dumps(
            {
                "sum_build": round(sum(r["build_s"] for r in rows), 2),
                "sum_analyze": round(sum(r["analyze_s"] for r in rows), 2),
                "sum_exec": round(sum(r["exec_s"] for r in rows), 2),
                "sum_total": round(sum(r["total_s"] for r in rows), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
