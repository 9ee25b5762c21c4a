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


def hot_key_salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    buckets: int = 16,
    threshold: int = 100_000,
    hot_keys: DataFrame | None = None,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """``salted_join`` that salts ONLY detected hot keys — the production
    form: replicating the whole small side ``buckets``× is wasteful when
    skew lives in a handful of keys. Cold keys join with salt 0 (no fanout,
    no extra rows); hot keys split across ``buckets`` reducers and their
    small-side rows replicate ``buckets``×, so the replication cost is
    ``buckets × |hot ∩ small|`` instead of ``buckets × |small|``.

    Hot-key detection defaults to an exact count over the large side's join
    key — a map-side-combined groupBy whose output is one row per key, tiny
    next to the join itself. At 100 TB pass ``hot_keys`` instead: a
    DataFrame of just the key columns, precomputed from a sample
    (``large.sample(0.001)`` with a scaled threshold) or from yesterday's
    ``skew_report``. Hot keys are by construction few, so the flag join is
    broadcast.

    Row-identical to ``large.join(small, on, how)`` for inner/left joins
    (each large row matches exactly one replica — the one carrying its own
    salt); right/full are rejected as in ``salted_join``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"hot_key_salted_join supports inner/left joins, got {how!r}")
    on = list(on)
    if hot_keys is None:
        hot_keys = (
            large.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") > threshold)
            .select(*on)
        )
    flags = F.broadcast(hot_keys.select(*on).distinct().withColumn("__hot", F.lit(True)))

    salted_large = (
        large.join(flags, on, "left")
        .withColumn(
            SALT,
            F.when(F.col("__hot"), (F.rand(seed) * buckets).cast("int")).otherwise(
                F.lit(0)
            ),
        )
        .drop("__hot")
    )
    replicated_small = (
        small.join(flags, on, "left")
        .withColumn(
            SALT,
            F.explode(
                F.when(
                    F.col("__hot"),
                    F.sequence(F.lit(0), F.lit(buckets - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )
    return salted_large.join(replicated_small, [*on, SALT], how).drop(SALT)


def skew_report(
    df: DataFrame,
    key_columns: Sequence[str] | str,
    *,
    top_k: int = 5,
) -> DataFrame:
    """Join/agg-key distribution diagnostics — the pre-flight check before
    pointing a shuffle at a key: if ``max_count`` dwarfs ``p99_count``,
    that key needs salting (``salted_join``/``salted_aggregate``) or AQE
    skew-join before the plan will survive scale.

    One count-by-key shuffle + one tiny aggregate over the count table;
    ``top_hot_keys`` is selected and ordered by (count desc, key asc) and
    rendered as a comma-joined ``key:count`` string so the result frame
    stays scalar-typed (array columns break downstream canonicalizers).
    All statistics are exact (interpolated
    percentiles over exact bigint counts — engine-stable doubles; the mean
    is a ×100 floor-divided integer).

    Output: one row (n_rows, n_keys, max_count, p50_count, p99_count,
    avg_count_x100, top_hot_keys).
    """
    keys = [key_columns] if isinstance(key_columns, str) else list(key_columns)
    key = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    counts = (
        df.select(key.alias("__key"))
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    top = (
        counts.orderBy(F.col("__cnt").desc(), F.col("__key").asc())
        .limit(top_k)
        .agg(
            F.array_sort(
                # negated count sorts ascending → (count desc, key asc)
                F.collect_list(
                    F.struct((-F.col("__cnt")).alias("nc"), F.col("__key"))
                )
            ).alias("__top")
        )
        .select(
            F.array_join(
                F.transform(
                    "__top",
                    lambda s: F.concat_ws(
                        ":", s["__key"], (-s["nc"]).cast("string")
                    ),
                ),
                ",",
            ).alias("top_hot_keys")
        )
    )
    stats = counts.agg(
        F.sum("__cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__cnt").alias("max_count"),
        F.percentile("__cnt", F.lit(0.5)).alias("p50_count"),
        F.percentile("__cnt", F.lit(0.99)).alias("p99_count"),
    ).withColumn(
        "avg_count_x100", F.expr("(n_rows * 100) DIV n_keys")
    )
    return stats.crossJoin(F.broadcast(top))


def join_size_report(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    top_k: int = 5,
) -> DataFrame:
    """Pre-flight join cardinality + skew cell report: the EXACT output
    row count of ``left ⋈ right on keys`` is ``Σ_k n_left(k)·n_right(k)``
    — computable from the two key-count tables WITHOUT running the join.
    Run this before pointing a multi-hour shuffle at a key: a blown-up
    estimate (join amplification) or a dominant ``max_cell`` (one key pair
    producing a huge fraction of output) means fix keys / salt / rethink
    before paying for the real thing.

    Cost: two map-side-combined count aggregations + an equi-join of the
    (tiny) count tables. Output one row: ``est_rows`` (exact inner-join
    cardinality), ``n_join_keys``, ``max_cell``, ``top_cells``
    (comma-joined ``key:count`` string, deterministic order — scalar so
    downstream canonicalizers never see an array column).

    NULL keys never match in an equi-join, so rows with a NULL in any key
    column are dropped before counting; the count tables group by and join
    on the RAW key columns (collision-free — no string encoding can merge
    two distinct keys), and the pipe-joined string is display-only for
    ``top_cells``.
    """
    on = list(on)
    lc = (
        left.dropna(subset=on)
        .groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__nl"))
    )
    rc = (
        right.dropna(subset=on)
        .groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__nr"))
    )
    cells = lc.join(rc, on).select(
        F.concat_ws("|", *[F.col(k).cast("string") for k in on]).alias("__key"),
        (F.col("__nl") * F.col("__nr")).alias("__cell"),
    )
    top = (
        cells.orderBy(F.col("__cell").desc(), F.col("__key").asc())
        .limit(top_k)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("__cell")).alias("nc"), F.col("__key"))
                )
            ).alias("__top")
        )
        .select(
            F.array_join(
                F.transform(
                    "__top",
                    lambda s: F.concat_ws(
                        ":", s["__key"], (-s["nc"]).cast("string")
                    ),
                ),
                ",",
            ).alias("top_cells")
        )
    )
    stats = cells.agg(
        F.sum("__cell").alias("est_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
        F.max("__cell").alias("max_cell"),
    )
    return stats.crossJoin(F.broadcast(top))
