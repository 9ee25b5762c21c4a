#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed to completion with the ``noop`` sink (full pipeline
runs, nothing is collected to the driver), timed after a warm-up of the
parquet footers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "rollup_revenue_nation_segment",
    "dv_hub_customer",
    "dv_sat_customer",
    "dv_link_orders_customer",
    # the xxhash64 twin is the production hash config (8-byte keys); the
    # md5-parity entry dv_multilink_lineitem stays oracle-checked in the
    # correctness gate, but the bench measures the config a 100 TB
    # deployment would run
    "dv_multilink_lineitem_xxh",
    "dv_pit_events",
    "dv_effectivity_events",
    "dv_zip_user_activity",
    "dv_latest_event_per_user",
    "dv_read_hub_sat_pit_events",
    "dv_linked_customer_orders",
    "dv_curated_customer",
    "events_hourly_window",
    "events_session_windows_30m",
    "dedup_exact_documents",
    "minhash_lsh_dedup_documents",
    "text_quality_documents",
    "ann_cosine_topk_embeddings",
    # r6 eval-battery heavies (VERDICT r6 item 2): the statistical ship
    # gates get round-over-round perf tracking alongside the DV/dedup set
    "pr_curve_length_en_documents",
    "retrieval_eval_embeddings",
    "pq_recall_embeddings",
    "chi_square_priority_status_orders",
    # r8 flagship split (VERDICT r7 item 4): ivf_pq_topk_embeddings'
    # single line was ~80% training, which a production index pays once
    # — track the two halves separately. The train line pays both Lloyd
    # trainings and emits the model; the frozen line serves the
    # candidate-pruned search against the memoized model (its untimed
    # warm-up run trains it), so it is the 100 TB-relevant search
    # latency. Their sum is the old composed line.
    "ivf_pq_train_model_embeddings",
    "ivf_pq_frozen_search_embeddings",
    # r8 additions: one representative per new family — the ER
    # composition (probabilistic linkage -> connected components), the
    # perceptual-hash media dedup, the t-closeness release gate, and
    # the FDR-controlled segment scan
    "entity_resolution_part",
    "ahash_near_dup_documents",
    "t_closeness_orders",
    "fdr_bh_value_rate_events",
    # r9 additions: one representative per new family — the Markov
    # removal-effect attribution (census + model-sized value
    # iteration), the Cox hazard fit (driver-coordinated Newton over
    # the death-time census), and the always-valid mSPRT peeking curve
    "markov_attribution_events",
    "cox_purchasers_events",
    "windowed_msprt_events",
    # r10 addition: the persisted-codes serve path (VERDICT r9 item 3)
    # — same frozen model and output as ivf_pq_frozen_search_embeddings
    # but serving from the cell-partitioned codes parquet written once
    # by its warm-up run, so the line measures the serve latency with
    # the per-call corpus re-encode (probe 94's one linear term) gone
    "ivf_pq_precoded_search_embeddings",
    # r11 additions (VERDICT r10 items 3 + 6a): the skew-stress salted
    # join — 90% of events collapsed onto one key, hot-key-only salting
    # — so probe 120's mitigation cost is regress-visible every round;
    # and the composed day-2 increment — batch N+1 through
    # incremental_minhash_pairs(existing_banded=) against the persisted
    # day-1 banded store (written once by the warm-up run), measuring
    # exactly the recurring cost of a daily ingest against on-disk state
    "skew_salted_join_events",
    "incremental_day2_minhash_documents",
    # the J9 effectivity-PIT on the r11 union-window plan (probe 122
    # addendum) — tracks the delete-branch cost next to dv_pit_events'
    # versions-only window
    "dv_pit_events_eff",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        app_name="bench",
        extra_conf={
            # the bench inputs are single small parquet files; split them so
            # scans use every core (2.6× on q1). On a real cluster with
            # 128MB+ files the session default (128MB splits) is correct —
            # this is a local-bench-shape knob, not an engine default.
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": "65536",
        },
    )

    registry = Q.queries()
    names = [n for n in HEADLINE if n in registry]

    # warm up the JVM, codegen and the parquet reader so the first timed
    # query is not charged for session start-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100).write.format(
        "noop"
    ).mode("overwrite").save()

    # median-of-3 per query: later runs reuse compiled codegen and a warm
    # page cache; the median filters out the ±50% swings single-run
    # sub-second timings show on this host (transient scheduling hiccups
    # one way, suspiciously-cached runs the other) so a real regression is
    # distinguishable from noise round-over-round
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    load_before = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        # one untimed full execution first: shuffle files land on disk,
        # codegen compiles, and the OS page cache warms — so a loaded or
        # cold box can't inflate the timed medians with one-off costs
        # (BENCH_r07 shipped 2x-inflated numbers from a dirty host)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        mid = len(samples) // 2
        median = (
            samples[mid]
            if len(samples) % 2
            else (samples[mid - 1] + samples[mid]) / 2
        )
        timings[name] = round(median, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # 1-minute load average before/after: a dirty box (load
                # >> 1 beyond this process) is self-describing in the
                # output instead of masquerading as a code regression
                "loadavg_before": load_before,
                "loadavg_after": round(os.getloadavg()[0], 2),
                # r12 (VERDICT r11 item 7): one explicit boolean so a
                # PERF diff over this record self-describes — any >10%
                # mover measured with dirty_box=true should be re-run
                # once before being believed (the r11 32-core PERF table
                # was contaminated by a loadavg-3.26 driver box)
                "dirty_box": load_before > 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
