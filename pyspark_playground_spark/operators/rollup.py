"""Mergeable time rollups: the hypertable "continuous aggregate" shape.

A rollup over an append-only event stream should never be recomputed from
scratch per batch. The standard design (TimescaleDB continuous aggregates,
Druid/Pinot rollup segments, the classic "summing merge tree") keeps the
aggregate in *mergeable* form — sum/count/min/max partials per (keys,
bucket) — so that

    rollup(all events) == merge(rollup(batch₁), rollup(batch₂), ...)

holds EXACTLY, and each new batch costs one aggregation over the batch
plus one merge over the (much smaller) summary rows it touches. Finalized
forms (avg, rates) are derived views over the partials.

Scale shape: ``time_rollup`` is one groupBy shuffle on (keys, bucket) with
map-side partial aggregation; ``merge_rollups`` unions summary tables and
re-aggregates — summary-sized, not event-sized. Exactness across engines:
counts/min/max are exact by construction; sums should be exact types
(integers/decimals) when cross-engine hashing matters — see the
``incremental_rollup_events`` oracle entry.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: merge rule per partial-column prefix: how two partials combine
_MERGE_FNS = {"sum_": F.sum, "cnt_": F.sum, "min_": F.min, "max_": F.max}


def time_rollup(
    df: DataFrame,
    ts_column: str,
    step: str,
    keys: Sequence[str],
    values: Sequence[str],
) -> DataFrame:
    """Aggregate events into mergeable per-bucket partials.

    Output: ``(*keys, bucket, cnt_rows, sum_<v>, cnt_<v>, min_<v>,
    max_<v> ...)`` with ``bucket = date_trunc(step, ts)``. All partial
    columns follow the prefix convention ``merge_rollups`` understands.
    ``step`` is a ``date_trunc`` unit (``"hour"``, ``"day"``, ...).
    """
    aggs = [F.count(F.lit(1)).alias("cnt_rows")]
    for v in values:
        aggs += [
            F.sum(v).alias(f"sum_{v}"),
            F.count(v).alias(f"cnt_{v}"),
            F.min(v).alias(f"min_{v}"),
            F.max(v).alias(f"max_{v}"),
        ]
    return (
        df.withColumn("bucket", F.date_trunc(step, F.col(ts_column)))
        .groupBy(*keys, "bucket")
        .agg(*aggs)
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Merge partial rollups produced by ``time_rollup`` (same schema).

    Each non-key column is combined by its prefix rule (``sum_``/``cnt_``
    re-sum, ``min_``/``max_`` re-extremize); the grouping key is every
    column without a recognized prefix (the original keys + ``bucket``).
    Associative and commutative — batches can merge in any order, any
    grouping, any number of times.
    """
    if not rollups:
        raise ValueError("merge_rollups needs at least one input")
    first = rollups[0]
    merged = first
    for r in rollups[1:]:
        merged = merged.unionByName(r)
    group_cols = [
        c for c in first.columns
        if not any(c.startswith(p) for p in _MERGE_FNS)
    ]
    aggs = []
    for c in first.columns:
        for prefix, fn in _MERGE_FNS.items():
            if c.startswith(prefix):
                aggs.append(fn(c).alias(c))
                break
    return merged.groupBy(*group_cols).agg(*aggs)


def finalize_rollup(rollup: DataFrame, values: Sequence[str]) -> DataFrame:
    """Derive finalized metrics (avg per value) from the mergeable
    partials, keeping the partial columns out of the result."""
    out = rollup
    proj = [c for c in rollup.columns if not any(
        c.startswith(p) for p in ("sum_", "cnt_", "min_", "max_")
    )]
    cols = list(proj) + ["cnt_rows"] if "cnt_rows" in rollup.columns else proj
    sel = [F.col(c) for c in dict.fromkeys(cols)]
    for v in values:
        sel += [
            F.col(f"sum_{v}"),
            F.col(f"min_{v}"),
            F.col(f"max_{v}"),
            (
                F.col(f"sum_{v}").cast("double")
                / F.col(f"cnt_{v}").cast("double")
            ).alias(f"avg_{v}"),
        ]
    return out.select(*sel)
