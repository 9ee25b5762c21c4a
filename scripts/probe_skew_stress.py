#!/usr/bin/env python
"""Skew-stress probe (VERDICT r9 item 7): turn the engine's skew-safety
claims into a standing measured number.

Builds a deliberately pathological join input from sf0.1 events — Nx
row replication with 90% of all rows collapsed onto ONE hot user_id
(the remaining 1,500 keys keep a uniform tail) — then measures the
same large⋈small user join executed three ways, fully materialized
through a global aggregate:

  1. `smj_noskew`  — plain sort-merge join with AQE skew-join OFF and
     broadcast disabled: the straggler baseline (one reducer gets 50%
     of the shuffle).
  2. `smj_aqe`     — same plan with AQE skew-join ON: Spark's runtime
     split of the oversized partition.
  3. `salted`      — `skew.hot_key_salted_join` (buckets=32): the
     engine's explicit mitigation; hot keys detected exactly, small
     side replicated only for the hot key.

Also prints the `skew.skew_report` diagnostic row for the stressed key
(max/p99 ratio ~4 orders of magnitude) — the pre-flight check that
says this key needs mitigation BEFORE the join is pointed at it.

All three variants return identical row counts (the salted join is
row-identical by construction). Broadcast stays disabled throughout so
the probe measures shuffle-side skew handling, not broadcast avoidance
(at 100 TB the small side may not broadcast).

Usage: python scripts/probe_skew_stress.py [replication] (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.operators import skew
from pyspark_playground_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
WORK = os.environ.get("SKEW_PROBE_DIR", "/tmp/skew_probe")


def synthesize(spark, replication: int) -> str:
    """10x events with 50% of rows collapsed onto user_id 1."""
    path = f"{WORK}_{replication}x"
    if not os.path.exists(f"{path}/events_skewed.parquet"):
        reps = spark.range(replication).select(F.col("id").alias("__rep"))
        ev = (
            Q.load_events(spark, SF_DIR)
            .select("event_id", "user_id", "event_type", "value")
            .crossJoin(reps)
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("__rep") * F.lit(100_000_000),
            )
            # 90% of events land on the hot key; the rest keep theirs
            .withColumn(
                "user_id",
                F.when(F.col("event_id") % 10 != 0, F.lit(1)).otherwise(
                    F.col("user_id")
                ),
            )
            .drop("__rep")
        )
        ev.write.mode("overwrite").parquet(f"{path}/events_skewed.parquet")
    return path


def run_variant(spark, large, small, variant: str) -> tuple[int, float]:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled",
        "true" if variant == "smj_aqe" else "false",
    )
    # make the skewed partition splittable at this (local) data scale
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1m",
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    if variant == "salted":
        joined = skew.hot_key_salted_join(
            large, small, ["user_id"], buckets=32, threshold=100_000
        )
    else:
        joined = large.join(small, "user_id")
    # global aggregate: fully materializes the join (every matched row
    # flows into the sum) without adding a second keyed shuffle, so the
    # measured wall isolates the join's own shuffle/sort skew
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value") + F.col("segment_spend")).alias("s"),
    )
    t0 = time.time()
    n = agg.collect()[0]["n"]
    return int(n), time.time() - t0


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="skew-stress")
    path = synthesize(spark, replication)
    # cache the probe input (key + payload only): the measured walls are
    # then the shuffle + sort + join + aggregate, not the
    # (variant-independent) scan or unused-column traffic
    large = (
        spark.read.parquet(f"{path}/events_skewed.parquet")
        .select("user_id", "value")
        .persist()
    )
    large.count()
    # small side: per-user spend dim built from the UNskewed sf0.1
    # events, written to parquet and READ BACK — a stored dim table.
    # (A dim cached straight off its groupBy keeps that hash
    # partitioning, the join then sorts WITHOUT a shuffle on that side,
    # and Spark's OptimizeSkewedJoin — which requires both SMJ children
    # to be shuffle reads — silently never fires: the smj_aqe variant
    # would measure nothing. Discovered by reading the final adaptive
    # plan; the read-back dim is also the realistic input.)
    if not os.path.exists(f"{path}/user_dim.parquet"):
        (
            Q.load_events(spark, SF_DIR)
            .groupBy("user_id")
            .agg(F.sum("value").alias("segment_spend"))
            .write.mode("overwrite")
            .parquet(f"{path}/user_dim.parquet")
        )
    small = spark.read.parquet(f"{path}/user_dim.parquet")

    rep = skew.skew_report(large, "user_id").collect()[0]
    print(json.dumps({
        "probe": "skew_report",
        "n_rows": rep["n_rows"], "n_keys": rep["n_keys"],
        "max_count": rep["max_count"], "p99_count": rep["p99_count"],
    }), flush=True)

    results = {}
    for variant in ("smj_noskew", "smj_aqe", "salted"):
        run_variant(spark, large, small, variant)  # warm-up untimed
        walls, rows = [], None
        for _ in range(3):
            rows, w = run_variant(spark, large, small, variant)
            walls.append(w)
        walls.sort()
        results[variant] = rows
        print(json.dumps({
            "probe": "skew_stress_join", "variant": variant,
            "rows": rows, "sec": round(walls[1], 2),
        }), flush=True)
    assert len(set(results.values())) == 1, (
        f"variants disagree on row count: {results}"
    )


if __name__ == "__main__":
    main()
