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


def t_closeness_census(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    sensitive_column: str,
    *,
    t_ppm: int = 200_000,
    group_size_column: str = "group_size",
    t_column: str = "t_ppm",
    flag_column: str = "t_close",
) -> DataFrame:
    """t-closeness census (Li, Li & Venkatasubramanian, ICDE'07 — the
    third rung of the release-gate ladder after k-anonymity and
    l-diversity): one row per quasi-identifier class with the Earth
    Mover's Distance between the class's distribution over an ORDERED
    sensitive attribute and the global distribution, in exact ppm, plus
    a ``t_ppm <= threshold`` flag. l-diversity counts distinct values;
    t-closeness catches the subtler leak where a class is diverse but
    SKEWED (e.g. every salary in the class sits in the top decile).

    For the ordered-distance ground metric the ICDE'07 EMD closed form
    is ``t = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|`` over the m global
    values in order. Everything is EXACT INTEGER arithmetic: the inner
    cumulative difference at value i is ``N·cumC − gs·cumG`` (class
    cumulative count scaled by the global population and vice versa),
    |·|-summed per class as DECIMAL(38,0), and the final
    ``t_ppm = (S·1e6) DIV (gs·N·(m−1))`` is one exact integral
    division — no doubles anywhere, bit-identical on any engine.
    Classes see every global value (absent ⇒ p_j = 0) via a grid join.
    NULL sensitive values are excluded entirely (an absent value
    discloses nothing and contributes no probability mass). A
    single-value domain (m = 1) has identical distributions by
    construction: t_ppm = 0.

    Scale contract: the sensitive attribute must be BOUNDED-DOMAIN
    ordinal (a band, decile, grade — the census discipline); the grid
    is classes × m rows built by broadcasting the m-row value census,
    the per-class cumulative window is partitioned by class, and the
    only unbounded shuffle is the one hash-aggregation on (QI, value)
    — the value census, class sizes and totals all derive from it by
    exact integer partition algebra (r12).
    """
    qi = [F.col(c) if isinstance(c, str) else c for c in quasi_identifiers]
    qi_names = [df.select(c).columns[0] for c in qi]
    base = df.select(
        *[c.alias(n) for c, n in zip(qi, qi_names)],
        F.col(sensitive_column).alias("__v"),
    ).filter(F.col("__v").isNotNull())
    # ONE data-sized aggregation (r12, guide §2.4/§1.2 step 1): the
    # (QI, value) census is the finest granularity — the former three
    # independent groupBys over `base` (gv / cv / cs) compiled to THREE
    # different exchanges over the source, so the physical plan scanned
    # the input four times. Deriving the value census (gv), class sizes
    # (cs) and totals from cv is exact integer partition algebra
    # (count per v = Σ_classes count per (class, v), etc.), and because
    # every derivation now shares cv's identical exchange subtree,
    # ReuseExchange collapses the plan to ONE source scan. The
    # repartition(1) bounds the census-sized remainder to a single task
    # (the frame is capped by |classes|·|values| — the bounded-domain
    # census contract — so 32 near-empty shuffle tasks per derivation
    # are pure scheduling overhead at any scale).
    cv = (
        base.groupBy(*qi_names, "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .repartition(1)
    )
    gv = cv.groupBy("__v").agg(F.sum("__c").alias("__g"))
    cs = cv.groupBy(*qi_names).agg(
        F.sum("__c").alias(group_size_column)
    )
    tot = gv.agg(
        F.sum("__g").alias("__N"), F.count(F.lit(1)).alias("__m")
    )
    # NULL-safe class join: a quasi-identifier class whose key holds a
    # NULL (groupBy keeps it as a class) must still find its own
    # per-value counts — a null-unsafe join would zero it out and
    # score a compliant class at maximal EMD
    left = cs.crossJoin(F.broadcast(gv))
    cond = F.col("l.__v") == F.col("r.__v")
    for qn in qi_names:
        cond = cond & F.col(f"l.{qn}").eqNullSafe(F.col(f"r.{qn}"))
    grid = (
        left.alias("l")
        .join(cv.alias("r"), cond, "left")
        .select(
            *[F.col(f"l.{qn}") for qn in qi_names],
            F.col("l.__v").alias("__v"),
            F.col("l.__g").alias("__g"),
            F.col(f"l.{group_size_column}"),
            F.coalesce(F.col("r.__c"), F.lit(0)).alias("__c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*qi_names)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    diff = d38(F.col("__N")) * d38(F.sum("__c").over(w)) - d38(
        F.col(group_size_column)
    ) * d38(F.sum("__g").over(w))
    per_class = (
        grid.select(
            *qi_names,
            F.col(group_size_column),
            F.col("__N"),
            F.col("__m"),
            F.abs(diff).alias("__ad"),
        )
        .groupBy(*qi_names)
        .agg(
            F.max(group_size_column).alias(group_size_column),
            F.max("__N").alias("__N"),
            F.max("__m").alias("__m"),
            F.sum("__ad").alias("__s"),
        )
    )
    t_val = F.when(F.col("__m") > 1, F.expr(
        f"(__s * 1000000) DIV (CAST({group_size_column} AS DECIMAL(38,0))"
        " * __N * (__m - 1))"
    )).otherwise(F.lit(0)).cast("long")
    return per_class.select(
        *qi_names,
        F.col(group_size_column),
        t_val.alias(t_column),
    ).withColumn(flag_column, F.col(t_column) <= F.lit(int(t_ppm)))
