#!/usr/bin/env python
"""Worked example: event-stream analytics with the temporal operator set.

Chain over the events table: sessionize → range-join raw events back into
their session intervals → purchase attribution via as-of join → ordered
funnel → hourly gap-filled (locf) per-user series → inter-event-gap
robust outliers. Every stage is a DataFrame→DataFrame operator from this
package; the composition is what a product-analytics warehouse runs
nightly, and each operator's shuffle shape is documented in SCALE.md.

Run: ``python examples/event_analytics_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import funnel as fu
from pyspark_playground_spark.operators import quality, temporal
from pyspark_playground_spark.queries import load_events
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "events.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="event-analytics-pipeline")
    events = load_events(spark, sf_dir)

    # 1. session intervals (30-minute inactivity gap)
    sessions = (
        events.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )

    # 2. range-join error events back into the session that contains them
    errors_in_sessions = temporal.range_join(
        events.where(F.col("event_type") == "error").select("user_id", "ts"),
        sessions,
        "ts", "session_start", "session_end", "user_id",
        bin_width=1800,
    ).groupBy("user_id", "session_start").agg(F.count(F.lit(1)).alias("n_errors"))

    # 3. attribution: each purchase matched to the latest prior view
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    # bucket="1 day" = the skew-safe plan: a hyperactive user's events
    # spread over per-day partitions instead of serializing into one task
    attributed = temporal.asof_join(
        purchases, views, "ts", "user_id", tolerance="7 days", bucket="1 day"
    )

    # 4. ordered conversion funnel
    depths = fu.funnel_summary(events, ["view", "click", "purchase"])

    # 5. hourly per-user activity, gaps forward-filled
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    series = temporal.gap_fill(hourly, "hour_ts", "1 hour", "user_id")

    # 5b. mergeable hourly rollup — the continuous-aggregate summary a
    # nightly job maintains incrementally (see rollup_stream_loader)
    from pyspark_playground_spark.operators import rollup as ru
    half1 = events.where(F.col("value") >= 0.5)
    half2 = events.where(F.col("value") < 0.5)
    summary = ru.merge_rollups(
        ru.time_rollup(half1, "ts", "hour", ["event_type"], ["value"]),
        ru.time_rollup(half2, "ts", "hour", ["event_type"], ["value"]),
    )

    # 6. robust outliers over per-user hourly volume
    flagged = quality.robust_outliers(
        hourly, "n_events", "user_id", threshold=3.0
    ).where("is_outlier")

    # 7. peak concurrency: how many sessions are open at once (the +1/−1
    # boundary sweep runs as a distributed prefix sum, not a single task)
    sess_us = sessions.select(
        F.monotonically_increasing_id().alias("sid"),
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("s_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("e_us"),
    )
    curve = temporal.concurrent_intervals(
        sess_us, "s_us", "e_us", id_column="sid"
    )
    peak = curve.agg(F.max("concurrent").alias("peak")).first()["peak"]

    # 8. weekly cohort retention + event-type transition matrix (exact
    # integer statistics; see the oracle-backed query entries)
    from pyspark_playground_spark.queries import (
        cohort_retention_events,
        event_transitions_events,
    )

    retention = cohort_retention_events(spark, sf_dir)
    transitions = event_transitions_events(spark, sf_dir)
    n_cohorts = retention.select("cohort_week").distinct().count()
    top_t = transitions.orderBy(F.col("n_transitions").desc()).first()

    n_sessions = sessions.count()
    n_err_sessions = errors_in_sessions.count()
    n_attr = attributed.where(F.col("view_event_id").isNotNull()).count()
    n_purch = attributed.count()
    funnel_rows = {r["stage"]: r["n_users"] for r in depths.collect()}
    n_series = series.count()
    n_flagged = flagged.count()
    n_summary = summary.count()

    print(f"sessions: {n_sessions} ({n_err_sessions} with errors)")
    print(f"attribution: {n_attr}/{n_purch} purchases matched to a prior view")
    print(f"funnel: {funnel_rows}")
    print(f"gap-filled hourly series rows: {n_series}")
    print(f"hourly-volume outliers: {n_flagged}")
    print(f"mergeable hourly summary rows: {n_summary}")
    print(f"peak concurrent sessions: {peak}")
    print(
        f"cohorts: {n_cohorts}; hottest transition: "
        f"{top_t['prev_type']}->{top_t['next_type']} "
        f"({top_t['prob_ppm'] / 10000:.1f}%)"
    )
    assert n_sessions > 0 and n_purch > 0 and n_series > 0 and n_summary > 0
    assert peak >= 1 and n_cohorts >= 1
    assert funnel_rows["view"] >= funnel_rows["click"] >= funnel_rows["purchase"]
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
