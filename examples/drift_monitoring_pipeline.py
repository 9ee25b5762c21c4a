#!/usr/bin/env python
"""Worked example: continuous drift monitoring for a production event feed.

The model-ops loop a 100 TB/day event pipeline runs to catch input drift
before it poisons downstream models, composed from this package's
operators:

1. bin partials — ``windowed_value_bins`` (the streaming-legal single
   windowed aggregation; in production this IS the streaming query and
   the finishing steps below run over its sink table);
2. two monitors from one partials stage — per-hour PSI
   (``psi_vs_baseline``: aggregate mass shift, alert ≥ 0.25) and
   per-hour exact-integer KS (``ks_vs_baseline``: worst CDF gap);
   plus the discrimination monitor from label-split partials
   (``windowed_label_bins`` → ``auc_vs_bins``): distribution drift
   tells you the input moved, a falling per-hour AUC tells you the
   score stopped separating the classes — the alert that actually
   precedes a bad filtering decision;
3. cohort drilldown — the drift trio on a suspect cohort
   (``drift_psi``/``drift_ks``/``drift_cvm`` on purchase vs rest);
4. profile shift — exact order statistics of order prices WITHOUT a
   global sort (``exact_order_statistics``) and per-nation balance
   quantiles (``grouped_order_statistics``);
5. per-entity smoothing — exact EWMA + Holt level/trend per user; the
   top |value − EWMA| movers are the entity-level drift suspects.

Run: ``python examples/drift_monitoring_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import profiling, temporal
from pyspark_playground_spark.session import get_spark
from pyspark_playground_spark.streaming import cdc as stream


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir and os.path.exists(os.path.join(argv_dir, "events.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="drift-monitoring-pipeline")
    from pyspark_playground_spark.queries import load_events

    events = load_events(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    # 1-2. one partials stage, two monitors
    bounds = events.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    parts = stream.windowed_value_bins(events, bounds=bounds, bins=16)
    baseline = parts.groupBy("bin").agg(F.sum("n").alias("n"))
    psi = stream.psi_vs_baseline(parts, baseline, bins=16)
    ks = stream.ks_vs_baseline(parts, baseline, bins=16)
    # PSI needs a minimum sample per window: Laplace smoothing drags a
    # handful-of-events window toward uniform, inflating PSI against any
    # peaked baseline — so alert only on windows with enough mass
    alerts = psi.filter((F.col("psi") >= 0.25) & (F.col("n_window") >= 50))
    print(f"hourly windows monitored: {psi.count()}, PSI alerts: {alerts.count()}")
    worst = ks.orderBy(F.col("ks_numerator").desc()).limit(3).collect()
    for r in worst:
        d = r.ks_numerator / (r.n_window * r.n_baseline)
        print(f"  worst KS windows: {r.window_start} D={d:.4f}")

    # 2b. discrimination monitor: per-hour binned AUC of value
    # predicting purchase — same bounded-state partials shape; a window
    # whose AUC collapses toward 0.5 is drifting in the way that MATTERS
    # (the score stopped ranking), even if PSI stayed quiet
    lparts = stream.windowed_label_bins(
        events.filter(F.col("event_type").isNotNull()),
        bounds=bounds,
        label_column=F.col("event_type") == "purchase",
        bins=16,
    )
    auc = stream.auc_vs_bins(lparts)
    flat = auc.filter(
        F.col("auc").isNotNull()
        & (F.abs(F.col("auc") - F.lit(0.5)) < F.lit(0.05))
        & (F.col("n_pos") + F.col("n_neg") >= 50)
    )
    print(
        f"discrimination monitor: {auc.count()} windows, "
        f"{flat.count()} near-coin-flip (|AUC-0.5|<0.05)"
    )

    # 3. cohort drilldown
    is_purchase = F.col("event_type") == "purchase"
    trio = {
        "psi": profiling.drift_psi(
            events, value_column="value", cohort_column=is_purchase, bins=32
        ).collect()[0],
        "ks": profiling.drift_ks(
            events, value_column="value", cohort_column=is_purchase, bins=32
        ).collect()[0],
        "cvm": profiling.drift_cvm(
            events, value_column="value", cohort_column=is_purchase, bins=32
        ).collect()[0],
    }
    ks_d = trio["ks"].ks_numerator / (trio["ks"].n_a * trio["ks"].n_b)
    print(
        f"purchase-cohort drilldown: PSI={trio['psi'].psi:.4f} "
        f"KS D={ks_d:.4f} CvM sum={trio['cvm'].cvm_sum:.4f}"
    )

    # 4. profile shift without a global sort
    stats = profiling.exact_order_statistics(
        orders,
        value_column="o_totalprice",
        quantiles=[0.5, 0.99],
        id_column="o_orderkey",
    ).collect()[0]
    print(f"order price p50={stats.q_0_5:.2f} p99={stats.q_0_99:.2f}")
    per_nation = profiling.grouped_order_statistics(
        customer,
        group_column="c_nationkey",
        value_column="c_acctbal",
        quantiles=[0.5],
        id_column="c_custkey",
    )
    print(f"per-nation balance medians: {per_nation.count()} nations")

    # 5. entity-level smoothing: biggest |value - EWMA| movers
    smoothed = temporal.ewma(
        events,
        key_column="user_id",
        ts_column="ts",
        value_column="value",
        alpha=0.125,
        tiebreak_column="event_id",
    )
    movers = (
        smoothed.withColumn("dev", F.abs(F.col("value") - F.col("ewma")))
        .orderBy(F.col("dev").desc())
        .limit(5)
        .collect()
    )
    print(f"top entity movers: {[(r.user_id, round(r.dev, 2)) for r in movers]}")
    trend = temporal.holt_smoothing(
        events,
        key_column="user_id",
        ts_column="ts",
        value_column="value",
        alpha=0.25,
        beta=0.125,
        tiebreak_column="event_id",
    )
    trending = (
        trend.groupBy("user_id")
        .agg(F.expr("max_by(trend, struct(ts, event_id))").alias("trend_last"))
        .orderBy(F.col("trend_last").desc())
        .limit(3)
        .collect()
    )
    print(f"steepest upward trends: {[(r.user_id,) for r in trending]}")
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
