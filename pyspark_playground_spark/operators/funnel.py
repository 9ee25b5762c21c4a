"""Ordered-funnel analysis over event streams.

Beyond-reference surface: the classic product-analytics operator — for an
ordered stage list (e.g. ``view -> click -> purchase``), find per user the
earliest time each stage was reached *strictly after* the previous stage,
and how deep the user got.

Plan shape: one conditional ``min`` aggregation per stage, each keyed on
the user — N small (stage lists are 3-6 long), so the cost is N narrow
shuffles on the user key with map-side partial aggregation, never a
per-user sort or a ``collect_list`` of the user's full history (which a
hot user would blow up at 100 TB). The stage-i aggregation joins the
stage-(i-1) result — one row per user, so AQE freely picks broadcast vs
shuffle join as the funnel narrows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    ts_column: str = "ts",
    user_column: str = "user_id",
    stage_column: str = "event_type",
) -> DataFrame:
    """Per-user ordered funnel: ``<stage>_ts`` for each reached stage plus
    ``funnel_depth`` (count of stages reached, in order).

    A stage counts only if it happens strictly after the previous reached
    stage ("view the product, then click, then buy"); users who never
    reached stage 1 are absent (they have depth 0 by definition).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    first, rest = stages[0], stages[1:]
    cur = (
        events.where(F.col(stage_column) == first)
        .groupBy(user_column)
        .agg(F.min(ts_column).alias(f"{first}_ts"))
    )
    prev = first
    for s in rest:
        nxt = (
            events.where(F.col(stage_column) == s)
            .join(cur.select(user_column, f"{prev}_ts"), user_column)
            .where(F.col(ts_column) > F.col(f"{prev}_ts"))
            .groupBy(user_column)
            .agg(F.min(ts_column).alias(f"{s}_ts"))
        )
        cur = cur.join(nxt, user_column, "left")
        prev = s
    depth = sum(
        (F.col(f"{s}_ts").isNotNull().cast("int") for s in stages), F.lit(0)
    )
    return cur.withColumn("funnel_depth", depth)


def funnel_summary(
    events: DataFrame,
    stages: Sequence[str],
    ts_column: str = "ts",
    user_column: str = "user_id",
    stage_column: str = "event_type",
) -> DataFrame:
    """Stage-level conversion counts: one row per stage with the number of
    users who reached it (in order) — the funnel chart's data."""
    per_user = funnel(events, stages, ts_column, user_column, stage_column)
    counts = per_user.agg(
        *[
            F.count(F.col(f"{s}_ts")).alias(f"__c_{i}")
            for i, s in enumerate(stages)
        ]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_index"),
                F.lit(s).alias("stage"),
                F.col(f"__c_{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(stage_rows).alias("r")).select(
        "r.stage_index", "r.stage", "r.n_users"
    )
