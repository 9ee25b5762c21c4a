#!/usr/bin/env python
"""Worked example: time-aware validation of a forecasting/monitoring
stack — the protocol that keeps "the model looked fine offline" from
meaning "we evaluated on the past leaking into itself".

1. fold design — ``rolling_origin_folds`` lays out expanding-window
   train/test splits on exact epoch arithmetic and reports the
   warm-start census (how many test-window users training already
   saw — warm/cold mix, not an error, but you want to KNOW);
2. baseline backtest — ``forecast_backtest_mase`` scores the 24h
   seasonal-naive forecast on every held-out fold against its own
   strictly-earlier error (Hyndman-Koehler MASE, exact integers):
   a real model must beat these numbers fold by fold to earn a deploy;
3. locate the break — when a fold degrades, the
   ``binary_segmentation_changepoint`` locator says WHEN the hourly
   level shifted and from what mean to what;
4. monitor in production — the same drift lens that validated offline
   runs windowed online: ``wasserstein_vs_baseline`` prices each
   hour's value distribution against the corpus baseline in bin units
   (the W1 finisher over the shared ``windowed_value_bins`` partials).

Run: ``python examples/temporal_validation_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators.sampling import rolling_origin_folds
from pyspark_playground_spark.operators.temporal import (
    binary_segmentation_changepoint,
    forecast_backtest_mase,
)
from pyspark_playground_spark.queries import load_events
from pyspark_playground_spark.session import get_spark
from pyspark_playground_spark.streaming import cdc as st


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="temporal-validation-example")
    e = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())

    # 1. fold design + warm-start census
    folds = rolling_origin_folds(
        e, "ts", n_folds=4, unit_column="user_id"
    ).collect()
    for r in sorted(folds, key=lambda r: r["fold"]):
        warm = (
            f"{r['seen_units']}/{r['test_units']} test users warm"
            if r["test_units"]
            else "no users"
        )
        print(
            f"fold {r['fold']}: train {r['train_rows']} rows -> "
            f"test {r['test_rows']} rows ({warm})"
        )

    # 2. seasonal-naive MASE per held-out fold
    bt = {r["fold"]: r for r in forecast_backtest_mase(
        e, n_folds=4, season_hours=24).collect()}
    for f in sorted(bt):
        r = bt[f]
        mase = (r["mase_q6"] or 0) / 1e6
        print(
            f"fold {f}: seasonal-naive MASE {mase:.3f} "
            f"({'degrading' if mase > 1.2 else 'stable'}; "
            f"test err {r['test_abs_err']}/{r['n_test']}h)"
        )

    # 3. where did the hourly level break?
    hourly = e.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
        .cast("long")
        .alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    cp = binary_segmentation_changepoint(
        hourly, x_column="x", y_column="y"
    ).collect()[0]
    print(
        f"changepoint: hourly volume shifted at x={cp['split_x']} "
        f"(mean {(cp['mean_left_q6'] or 0) / 1e6:.1f} -> "
        f"{(cp['mean_right_q6'] or 0) / 1e6:.1f})"
    )

    # 4. the online W1 monitor over the same values
    ev = e.filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    parts = st.windowed_value_bins(ev, bounds=bounds, bins=16)
    baseline = parts.groupBy("bin").agg(F.sum("n").alias("n"))
    worst = (
        st.wasserstein_vs_baseline(parts, baseline, bins=16)
        .orderBy(F.col("w1_q6").desc_nulls_last())
        .limit(1)
        .collect()[0]
    )
    print(
        f"online monitor: worst hourly W1 vs baseline = "
        f"{(worst['w1_q6'] or 0) / 1e6:.3f} bins at "
        f"{worst['window_start']}"
    )

    print("PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
