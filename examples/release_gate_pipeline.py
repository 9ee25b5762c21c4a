#!/usr/bin/env python
"""Worked example: the pre-release gate sweep a corpus passes before it
ships — privacy, mixture serialization, and shard-quality auditing, each
a measured operator rather than a checklist item:

1. privacy — k-anonymity census + one-row gate over the customer
   dimension joined into the corpus metadata (does any quasi-identifier
   combination narrow a record below k candidates), and l-diversity of
   the sensitive column inside each QI class;
2. contract — functional-dependency census (is the id column still a
   key; did the enum column silently become per-row);
3. serialize — deterministic round-robin interleave across sources
   (reproducible training order where consecutive batches see the whole
   mixture), then byte-balanced shards planned on the INTERLEAVED
   position instead of the raw id;
4. audit the shards — per-shard source-mix HHI (a shard that is 100%
   one source defeats the mixture at batch granularity) before vs
   after interleaving;
5. survival sanity — Kaplan-Meier over user activity spans (is the
   engagement horizon long enough to trust the event-derived labels).

Run: ``python examples/release_gate_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import layout, privacy, profiling, sampling
from pyspark_playground_spark.operators import survival as surv
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "documents.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="release-gate-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    # 1. privacy gates on the tabular dimension
    qi = [
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
    ]
    gate = privacy.k_anonymity_summary(cust, qi, k=5).collect()[0]
    print(
        f"k-anonymity: {gate['rows_below_k']}/{gate['n_rows']} rows below "
        f"k=5 across {gate['n_classes']} classes "
        f"(worst re-identification risk {gate['max_reident_risk_q6']}e-6)"
    )
    ldiv = privacy.l_diversity_census(
        cust, [F.col("c_nationkey")], "c_mktsegment", l=2
    )
    homogeneous = ldiv.filter(~F.col("l_diverse")).count()
    print(f"l-diversity: {homogeneous} homogeneous nation classes (l=2)")

    # 2. data-contract audit
    fds = profiling.functional_dependencies(
        cust, [("c_custkey", "c_nationkey"), ("c_nationkey", "c_mktsegment")]
    ).collect()
    for r in fds:
        state = "HOLDS" if r["holds"] else (
            f"violated in {r['violating_groups']}/{r['n_groups']} groups"
        )
        print(f"contract {r['fd']}: {state}")

    # 3. interleave, then shard on the interleaved position
    inter = sampling.interleave_by_group(
        docs.select("doc_id", "source", "n_chars"),
        group_column="source",
        order_column="doc_id",
    )
    planned = layout.plan_shards(
        inter,
        bytes_column="n_chars",
        target_bytes=16384,
        order_column="global_pos",
    )

    # 4. shard mixture audit: id-ordered vs interleaved
    naive = layout.plan_shards(
        docs.select("doc_id", "source", "n_chars"),
        bytes_column="n_chars",
        target_bytes=16384,
        order_column="doc_id",
    )
    for name, plan in (("id-ordered", naive), ("interleaved", planned)):
        rep = layout.shard_mixture_report(
            plan, shard_column="shard", group_column="source"
        )
        row = rep.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum((F.col("hhi_q6") == 1_000_000).cast("int")).alias("pure"),
            F.max("hhi_q6").alias("worst"),
        ).collect()[0]
        print(
            f"shards ({name}): {row['n_shards']} shards, "
            f"{row['pure']} single-source, worst HHI {row['worst']}"
        )

    # 5. survival sanity over the event horizon
    events = None
    try:
        from pyspark_playground_spark.queries import load_events

        events = load_events(spark, sf_dir)
    except Exception:
        pass
    if events is not None:
        km = surv.kaplan_meier(
            surv.user_lifetimes(events, churn_horizon_hours=24)
        )
        steps = km.orderBy("duration").collect()
        if steps:
            last = steps[-1]
            print(
                f"Kaplan-Meier: {len(steps)} churn steps, "
                f"S({last['duration']}h) = {last['survival_q9']}e-9 "
                f"({last['at_risk']} still at risk)"
            )
        else:
            print("Kaplan-Meier: no churn observed inside the horizon")

    print("PIPELINE OK")


if __name__ == "__main__":
    main()
