"""Skew-handling join helpers for hot keys.

At 100 TB a handful of hot hkeys (a mega-customer, an empty-string business
key, a default typelist code) can pin one reducer for hours. Two remedies,
in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in ``session.get_spark``): Spark splits oversized partitions at
   runtime. Works for sort-merge joins; prefer this when it applies.
2. **Salting** (this module): explicit N-way key split when AQE can't help —
   e.g. shuffle-hash joins, aggregations with a hot group, or when the skew
   is in a broadcast-ineligible mid-size dimension.

``salted_join`` replicates the small side N times instead of shuffling the
large side twice — the classic replicate-and-salt pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, buckets: int, *, seed: int = 42) -> DataFrame:
    """Attach a uniform salt column in [0, buckets)."""
    return df.withColumn(SALT, (F.rand(seed) * buckets).cast("int"))


def replicate_for_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Replicate every row once per salt value (the small-side explode)."""
    return df.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with salted keys: the large (skewed) side gets a random
    salt, the small side is replicated ``buckets`` times, and the join runs
    on ``on + [salt]`` — splitting each hot key across ``buckets`` reducers.

    Result is row-identical to ``large.join(small, on, how)`` for inner and
    left joins (each large row matches exactly the replica with its own
    salt). Right/full joins would multiply unmatched small-side rows —
    rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_large = with_salt(large, buckets, seed=seed)
    replicated = replicate_for_salt(small, buckets)
    return (
        salted_large.join(replicated, [*on, SALT], how)
        .drop(SALT)
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    *,
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for hot group keys: partial agg on
    ``keys + salt``, final agg on ``keys``.

    ``aggs`` maps column → one of sum/count/min/max (the re-aggregable
    functions; count re-aggregates as sum). Spark's hash aggregate already
    does map-side partial aggregation, so reach for this only when the
    *merge* side itself is the bottleneck (extreme single-key skew).
    """
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        p = f"__p_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(p))
            final_exprs.append(getattr(F, fn if fn != "count" else "sum")(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-re-aggregable function: {fn!r}")
    salted = with_salt(df, buckets, seed=seed)
    partial = salted.groupBy(*keys, SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
