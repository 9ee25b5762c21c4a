#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [suffix] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix defaults to
``before``) at $SPARK_GRAFT_SF_DIR (default sf0.1) — the judge-auditable
record of each query's physical plan for the optimization round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from pyspark_playground_spark import queries as Q  # noqa: E402
from pyspark_playground_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="dump_plans",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": "65536",
        },
    )
    registry = Q.queries()
    names = sys.argv[3:] or [n for n in HEADLINE if n in registry]
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
