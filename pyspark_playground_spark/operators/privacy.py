"""Privacy / re-identification audits over tabular and document data.

The reference engine has no privacy layer (its PII handling stops at the
Data-Vault record-source lineage columns, `RawVault.py:64-185`); these are
the release-gate audits a training-data pipeline runs before shipping a
corpus: k-anonymity (is any quasi-identifier combination rare enough to
single a person out) and l-diversity (does a quasi-identifier group leak
its sensitive attribute because everyone in it shares one value).

Both are single hash-aggregations on the quasi-identifier key — one
shuffle, map-side combined, no joins — so they run at corpus scale exactly
like exact dedup does. Sweeney's k-anonymity and the
Machanavajjhala-et-al. l-diversity definitions are followed verbatim
(public literature; no sketching — the counts are exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_census(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    *,
    k: int = 5,
    group_size_column: str = "group_size",
    flag_column: str = "k_anonymous",
) -> DataFrame:
    """Per-equivalence-class census: one row per distinct quasi-identifier
    combination with its exact population and a ``count >= k`` flag.

    A dataset is k-anonymous iff every row's flag is true; the rows where
    it is false are exactly the records an attacker who knows the
    quasi-identifiers can narrow to fewer than ``k`` candidates.

    Plan: one groupBy on the QI tuple (partial aggregation map-side, a
    single exchange on the combo key). Skewed combos are harmless — the
    aggregate is a count.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_identifiers]
    return df.groupBy(*cols).agg(
        F.count(F.lit(1)).alias(group_size_column)
    ).withColumn(flag_column, F.col(group_size_column) >= F.lit(k))


def k_anonymity_summary(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    *,
    k: int = 5,
) -> DataFrame:
    """One-row release gate over the census: total rows, number of
    equivalence classes, classes and ROWS below ``k`` (the at-risk
    population), the smallest class, and the worst-case re-identification
    probability ``1/min_class_size`` quantized
    floor(1e6/x+0.5) -> BIGINT (tie-proof across engines, unlike printf).

    Derived entirely from the census frame (one aggregation over the
    class-level rows — the second pass never rescans the input).
    """
    census = k_anonymity_census(df, quasi_identifiers, k=k)
    return census.agg(
        F.sum("group_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(~F.col("k_anonymous"), 1).otherwise(0))
        .cast("long")
        .alias("classes_below_k"),
        F.sum(F.when(~F.col("k_anonymous"), F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        F.min("group_size").cast("long").alias("min_class_size"),
    ).select(
        "n_rows",
        "n_classes",
        "classes_below_k",
        "rows_below_k",
        "min_class_size",
        F.floor(
            F.lit(1e6) / F.col("min_class_size").cast("double") + F.lit(0.5)
        ).cast("long").alias("max_reident_risk_q6"),
    )


def l_diversity_census(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    sensitive_column: str,
    *,
    l: int = 2,
    group_size_column: str = "group_size",
    distinct_column: str = "n_sensitive",
    flag_column: str = "l_diverse",
) -> DataFrame:
    """Distinct-l-diversity census: one row per quasi-identifier class
    with its population, the number of DISTINCT sensitive values observed
    in it, and an ``n_sensitive >= l`` flag.

    A class that fails is a homogeneity leak: knowing someone's
    quasi-identifiers reveals their sensitive attribute even though the
    class itself is k-large. NULL sensitive values are excluded from the
    distinct count (an absent value discloses nothing), but the rows
    still count toward the class population.

    Plan: exact count-distinct inside one groupBy — Spark expands this to
    the standard two-phase distinct aggregation (partial distinct on
    (QI, sensitive), then the final count), still a single logical
    aggregation with no join.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_identifiers]
    return df.groupBy(*cols).agg(
        F.count(F.lit(1)).alias(group_size_column),
        F.count_distinct(F.col(sensitive_column)).alias(distinct_column),
    ).withColumn(flag_column, F.col(distinct_column) >= F.lit(l))
