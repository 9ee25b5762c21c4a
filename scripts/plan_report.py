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


def _composed_vault_corpus_plan(spark, sf_dir: str) -> str:
    """The example's vault-read -> corpus-pipeline chain as one plan,
    built from the kernel functions over lazy frames (no catalog, no
    streaming — identical plan shape to the worked example's step 4-5)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from pyspark_playground_spark.conventions import (
        END_OF_TIME,
        DataVaultConventions,
    )
    from pyspark_playground_spark.operators import business_vault as bv
    from pyspark_playground_spark.plans import pipeline as pl

    conv = DataVaultConventions()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = datetime(2026, 2, 1)
    hub = docs.select(
        F.md5(F.col("doc_id").cast("string")).alias(conv.hkey()),
        F.lit(t0).alias(conv.load_date()),
        F.lit("plan-report").alias(conv.record_source()),
        F.col("doc_id").cast("string").alias("DOC_ID"),
    )
    sat = docs.select(
        F.md5(F.col("doc_id").cast("string")).alias(conv.hkey()),
        F.md5(F.col("text")).alias(conv.hdiff()),
        F.lit(t0).alias(conv.load_date()),
        F.col("text").alias("TEXT"),
        F.col("lang").alias("LANG"),
        F.col("source").alias("SOURCE"),
    )
    view = bv.read_data_from_hub(
        hub, sat, None, ["TEXT", "LANG", "SOURCE"], conv=conv
    )
    current = (
        view.filter(F.col(conv.load_end_date()) == F.lit(END_OF_TIME))
        .select(
            F.col("DOC_ID").cast("bigint").alias("doc_id"),
            F.col("TEXT").alias("text"),
            F.col("LANG").alias("lang"),
            F.col("SOURCE").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    spec = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "vault_corpus_pipeline.yaml",
    )
    out = pl.run_pipeline(current, spec)
    return out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


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
    if not only:
        plan = _composed_vault_corpus_plan(spark, sf_dir)
        lines.append("## composed: vault read view -> corpus pipeline\n")
        lines.append(
            "The `examples/vault_to_corpus_pipeline.py` chain as ONE lazy"
        )
        lines.append(
            "Catalyst plan (hub/sat read -> current-view filter ->"
        )
        lines.append(
            "`examples/vault_corpus_pipeline.yaml` stages), rebuilt here"
        )
        lines.append(
            "catalog-free from the same kernel functions so the composed"
        )
        lines.append("plan is regenerated with every report.\n")
        for f in facts(plan):
            lines.append(f"- {f}")
        lines.append("")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
