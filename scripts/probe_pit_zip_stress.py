#!/usr/bin/env python
"""PIT/zip skew-stress probe (VERDICT r10 item 6b): the vault side's
first decade curve, with a deliberately hot hub key.

Probes 93/119/121 all live on the LLM side; this one measures the two
business-vault workhorses — `business_vault.pit_rows` (lead-window PIT
construction) and `zip_historized_dataframes` (temporal interval
intersection) — on events replicated Nx where 90% of all rows collapse
onto ONE hub entity (event_id % 10 != 0 → user 1), ts shifted per
replica so the hot entity's DISTINCT version count genuinely scales
(PIT deduplicates (hkey, load_date) first; un-shifted replicas would
collapse back to the 1x version count and measure nothing).

Why this shape matters at 100 TB: `pit_rows` is a window PARTITION BY
hkey — a window partition cannot be split by AQE, so one pathological
entity (a bot user, a default/null business key, a heartbeat device)
serializes its own versions into a single task. The probe puts a
number on how bad that gets relative to the same row count spread
uniformly, for both the PIT window and the interval-zip join above it.

Variants (same total rows, same session confs):
  pit_uniform  — pit_rows over the replicated satellite, keys untouched
  pit_skewed   — same rows, 90% collapsed onto the hot hkey
  zip_uniform  — clicks-zip-purchases (dv_zip_user_activity's shape)
  zip_skewed   — same with the hot key (the interval join fans out
                 hot-clicks × hot-purchases — the quadratic corner the
                 overlap predicate bounds only per pair)

Each variant is fully materialized through a global aggregate; median
of 3 timed runs after one untimed warm-up. Output: one JSON line per
variant.

Usage: python scripts/probe_pit_zip_stress.py [replication] [variants]
  replication: events multiplier (default 10)
  variants: comma list to run (default all; e.g. "pit_uniform,pit_skewed"
  for a 100x PIT-only decade point — the unbucketed zip_skewed is
  quadratic in the hot key and must not be pointed at 100x).
  The special variant "zip_width_sweep" runs the bucketed skewed zip
  across widths 10min/1h/6h/1day (the SCALE.md width-sensitivity
  curve: under-splitting costs quadratically, over-splitting linearly).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.conventions import DataVaultConventions
from pyspark_playground_spark.functions.hashing import hash_key
from pyspark_playground_spark.operators import business_vault as bv
from pyspark_playground_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("PIT_PROBE_DIR", "/tmp/pit_zip_probe")
C = DataVaultConventions()


def synthesize(spark, replication: int) -> str:
    """Nx events; ts shifted +__rep seconds so versions stay distinct;
    `user_skew` collapses 90% of rows onto user 1, `user_id` keeps the
    uniform original — both columns in one parquet so the uniform and
    skewed variants scan identical bytes."""
    path = f"{WORK}_{replication}x"
    if not os.path.exists(f"{path}/events_rep.parquet/_SUCCESS"):
        reps = spark.range(replication).select(F.col("id").alias("__rep"))
        ev = (
            Q.load_events(spark, SF_DIR)
            .select("event_id", "user_id", "event_type", "ts")
            .crossJoin(reps)
            .withColumn(
                "ts",
                F.timestamp_add("SECOND", F.col("__rep").cast("int"), "ts"),
            )
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("__rep") * F.lit(100_000_000),
            )
            .withColumn(
                "user_skew",
                F.when(F.col("event_id") % 10 != 0, F.lit(1).cast("long"))
                .otherwise(F.col("user_id")),
            )
            .drop("__rep")
        )
        ev.write.mode("overwrite").parquet(f"{path}/events_rep.parquet")
    return path


def pit_variant(df, key_col: str, with_eff: bool = False):
    sat = df.select(
        hash_key([key_col]).alias(C.hkey()),
        F.col("ts").alias(C.load_date()),
    )
    eff = None
    if with_eff:
        # 'error' events play the DELETE role (dv_effectivity_events'
        # convention): the hot entity now owns ~90% of the deletes too
        eff = df.filter(F.col("event_type") == "error").select(
            hash_key([key_col]).alias(C.hkey()),
            F.lit(True).alias(C.deleted()),
            F.col("ts").alias(C.load_date()),
        )
    pit = bv.pit_rows(sat, eff, end_of_time=None)
    return pit.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(C.load_end_date()).alias("n_closed"),
    )


def zip_variant(df, key_col: str, bucket=None):
    ld, led = C.load_date(), C.load_end_date()
    w = Window.partitionBy(key_col).orderBy("ts")
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col(key_col).alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias(ld),
        F.lead("ts").over(w).alias(led),
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col(key_col).alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias(ld),
        F.lead("ts").over(w).alias(led),
    )
    zipped = bv.zip_historized_dataframes(
        clicks, purchases, F.col("l.user_id") == F.col("r.p_user_id"),
        bucket=bucket,
    )
    return zipped.agg(F.count(F.lit(1)).alias("n"))


def timed(agg) -> tuple[int, float]:
    t0 = time.time()
    n = agg.collect()[0]["n"]
    return int(n), time.time() - t0


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(app_name="pit-zip-stress")
    path = synthesize(spark, replication)
    df = spark.read.parquet(f"{path}/events_rep.parquet").persist()
    total = df.count()
    hot = df.filter(F.col("user_skew") == 1).count()
    print(json.dumps({
        "probe": "pit_zip_stress_input", "replication": replication,
        "rows": total, "hot_key_rows": hot,
    }), flush=True)

    variants = {
        "pit_uniform": lambda: pit_variant(df, "user_id"),
        "pit_skewed": lambda: pit_variant(df, "user_skew"),
        "pit_eff_uniform": lambda: pit_variant(df, "user_id", with_eff=True),
        "pit_eff_skewed": lambda: pit_variant(df, "user_skew", with_eff=True),
        "zip_uniform": lambda: zip_variant(df, "user_id"),
        "zip_skewed_bucketed": lambda: zip_variant(
            df, "user_skew", bucket="1 hour"
        ),
        # the pathological one last: quadratic in the hot key's version
        # count inside one SMJ partition — at replication >= 10 it runs
        # ONCE with no warm-up (minutes-long; noise is irrelevant at
        # that magnitude, and the bucketed line above is the contrast)
        "zip_skewed": lambda: zip_variant(df, "user_skew"),
    }
    if only and "zip_width_sweep" in only:
        for width in ("10 minutes", "1 hour", "6 hours", "1 day"):
            timed(zip_variant(df, "user_skew", bucket=width))  # warm-up
            walls, rows = [], None
            for _ in range(3):
                rows, w = timed(zip_variant(df, "user_skew", bucket=width))
                walls.append(w)
            walls.sort()
            print(json.dumps({
                "probe": "zip_width_sweep", "width": width,
                "replication": replication, "rows": rows,
                "sec": round(walls[1], 2),
            }), flush=True)
        only.discard("zip_width_sweep")

    for name, mk in variants.items():
        if only is not None and name not in only:
            continue
        single = name == "zip_skewed" and replication >= 10
        if not single:
            timed(mk())  # warm-up untimed
        walls, rows = [], None
        for _ in range(1 if single else 3):
            rows, w = timed(mk())
            walls.append(w)
        walls.sort()
        print(json.dumps({
            "probe": "pit_zip_stress", "variant": name,
            "replication": replication, "rows": rows,
            "sec": round(walls[len(walls) // 2], 2),
            "runs": len(walls),
        }), flush=True)


if __name__ == "__main__":
    main()
