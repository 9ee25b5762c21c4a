#!/usr/bin/env python
"""Generate PLANS.md: physical-plan evidence for EVERY registry entry.

For each query entry at $SPARK_GRAFT_SF_DIR, records the
`.explain("formatted")` summary plus extracted plan facts: exchange count,
join strategies chosen, pushed filters and pruned read schemas on every
parquet scan. This is the artifact to eyeball for scale regressions — a
scan that stopped pruning or a join that went nested-loop shows up here
before it shows up in wall time.

Usage: python scripts/plan_report.py [out_path]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.session import get_spark

def facts(plan: str) -> list[str]:
    out = []
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    out.append(f"exchanges: {n_ex}")
    joins = sorted(set(re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
    out.append("joins: " + (", ".join(joins) if joins else "none"))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nontrivial = [p for p in pushed if p.strip()]
    out.append(f"scans with pushed filters: {len(nontrivial)}/{len(pushed)}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        out.append(f"scan column counts: {widths}")
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-report")
    registry = Q.QUERIES  # registration order — stable across rotations
    only = set(sys.argv[2:])
    lines = [
        "# PLANS — physical-plan evidence (auto-generated)\n",
        f"`python scripts/plan_report.py` at `{sf_dir}`. Per query: plan",
        "facts extracted from `.explain(\"formatted\")` (exchange count,",
        "join strategies, filter pushdown, scan column pruning). Regenerate",
        "after planner-affecting changes.\n",
        "Reading guide: `pushed filters: 0/0` = the query has no",
        "pushable predicate (full-table scans are correct for census-style",
        "entries); BroadcastNestedLoopJoin appears ONLY in the",
        "bounded-panel similarity/eval families (fixed-size query panel",
        "broadcast against a streaming corpus — by design, documented per",
        "operator); CartesianProduct must never appear.\n",
    ]
    for name in registry:
        if only and name not in only:
            continue
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines.append(f"## {name}\n")
        for f in facts(plan):
            lines.append(f"- {f}")
        lines.append("")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
