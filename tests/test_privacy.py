"""Privacy-audit operators (operators/privacy.py): k-anonymity and
l-diversity census semantics pinned against hand-computed fixtures."""

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import privacy as pv


def _people(spark):
    # (zip, age_band, disease) — classic QI/sensitive toy fixture
    rows = [
        ("02138", "20s", "flu"),
        ("02138", "20s", "flu"),
        ("02138", "20s", "cold"),
        ("02139", "20s", "flu"),
        ("02139", "30s", "cold"),
        ("02139", "30s", None),
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "disease"])


def test_k_anonymity_census_counts_and_flags(spark):
    out = pv.k_anonymity_census(
        _people(spark), ["zip", "age_band"], k=2
    ).collect()
    by_key = {(r["zip"], r["age_band"]): r for r in out}
    assert len(by_key) == 3
    assert by_key[("02138", "20s")]["group_size"] == 3
    assert by_key[("02138", "20s")]["k_anonymous"] is True
    assert by_key[("02139", "20s")]["group_size"] == 1
    assert by_key[("02139", "20s")]["k_anonymous"] is False
    assert by_key[("02139", "30s")]["group_size"] == 2
    assert by_key[("02139", "30s")]["k_anonymous"] is True


def test_k_anonymity_summary_gate(spark):
    row = pv.k_anonymity_summary(_people(spark), ["zip", "age_band"], k=2).first()
    assert row["n_rows"] == 6
    assert row["n_classes"] == 3
    assert row["classes_below_k"] == 1
    assert row["rows_below_k"] == 1
    assert row["min_class_size"] == 1
    assert row["max_reident_risk_q6"] == 1_000_000


def test_l_diversity_null_sensitive_excluded_from_distinct(spark):
    out = pv.l_diversity_census(
        _people(spark), ["zip", "age_band"], "disease", l=2
    ).collect()
    by_key = {(r["zip"], r["age_band"]): r for r in out}
    # (02139, 30s): rows = 2 (NULL row counts toward population),
    # distinct sensitive = 1 (NULL discloses nothing) -> not diverse
    assert by_key[("02139", "30s")]["group_size"] == 2
    assert by_key[("02139", "30s")]["n_sensitive"] == 1
    assert by_key[("02139", "30s")]["l_diverse"] is False
    assert by_key[("02138", "20s")]["n_sensitive"] == 2
    assert by_key[("02138", "20s")]["l_diverse"] is True


def test_k_anonymity_expression_qi(spark):
    # QI may be an expression column (banding), not just a raw column
    df = spark.createDataFrame(
        [(1, 150.0), (2, 180.0), (3, 950.0)], ["id", "bal"]
    )
    out = pv.k_anonymity_census(
        df, [F.floor(F.col("bal") / 100).cast("int").alias("band")], k=2
    ).collect()
    by_band = {r["band"]: r for r in out}
    assert by_band[1]["group_size"] == 2 and by_band[1]["k_anonymous"] is True
    assert by_band[9]["group_size"] == 1 and by_band[9]["k_anonymous"] is False


def test_t_closeness_hand_computed(spark):
    """Ordered-EMD fixtures: a class that mirrors the global
    distribution scores 0; a class concentrated on the top value scores
    the textbook maximum; a python mirror pins every row exactly."""
    from pyspark_playground_spark.operators.privacy import (
        t_closeness_census,
    )

    # global domain {0,1,2}; class A mirrors global evenly, class B all-2
    rows = (
        [("A", v) for v in (0, 1, 2) for _ in range(4)]
        + [("B", 2)] * 6
    )
    df = spark.createDataFrame(rows, "qi string, v bigint")
    out = {
        r["qi"]: r
        for r in t_closeness_census(
            df, ["qi"], "v", t_ppm=200_000
        ).collect()
    }
    # python mirror of the exact integer construction
    import math
    from collections import Counter

    g = Counter(v for _, v in rows)
    n = sum(g.values())
    m = len(g)
    values = sorted(g)
    for qi in ("A", "B"):
        cls = Counter(v for q, v in rows if q == qi)
        gs = sum(cls.values())
        s = 0
        cc = cg = 0
        for v in values:
            cc += cls.get(v, 0)
            cg += g[v]
            s += abs(n * cc - gs * cg)
        expect = (s * 1_000_000) // (gs * n * (m - 1))
        assert out[qi]["t_ppm"] == expect, qi
    # class A mirrors the global mix only approximately (B's mass is
    # all-2), so its EMD is small but non-zero; B is heavily skewed
    assert out["B"]["t_ppm"] > out["A"]["t_ppm"]
    assert out["B"]["group_size"] == 6 and out["A"]["group_size"] == 12
    assert bool(out["B"]["t_close"]) is False

    # a class whose distribution IS the global distribution: t = 0
    even = [("X", v) for v in (0, 1, 2)] + [("Y", v) for v in (0, 1, 2)]
    df2 = spark.createDataFrame(even, "qi string, v bigint")
    for r in t_closeness_census(df2, ["qi"], "v").collect():
        assert r["t_ppm"] == 0 and bool(r["t_close"]) is True

    # single-value domain (m=1): identical by construction, t = 0
    df3 = spark.createDataFrame(
        [("X", 5), ("Y", 5)], "qi string, v bigint"
    )
    for r in t_closeness_census(df3, ["qi"], "v").collect():
        assert r["t_ppm"] == 0

    # NULL sensitive values contribute nothing (not even population)
    df4 = spark.createDataFrame(
        [("X", 0), ("X", None), ("Y", 0)], "qi string, v bigint"
    )
    out4 = {r["qi"]: r for r in
            t_closeness_census(df4, ["qi"], "v").collect()}
    assert out4["X"]["group_size"] == 1


def test_t_closeness_null_qi_class(spark):
    """Review regression: a class keyed by a NULL quasi-identifier must
    see its own counts (null-safe grid join) — a NULL class that
    mirrors the global distribution scores 0, not maximal EMD."""
    from pyspark_playground_spark.operators.privacy import (
        t_closeness_census,
    )

    rows = [(None, v) for v in (0, 1, 2)] + [("x", v) for v in (0, 1, 2)]
    df = spark.createDataFrame(rows, "qi string, v bigint")
    out = {r["qi"]: r for r in
           t_closeness_census(df, ["qi"], "v").collect()}
    assert out[None]["t_ppm"] == 0 and out["x"]["t_ppm"] == 0
    assert out[None]["group_size"] == 3
