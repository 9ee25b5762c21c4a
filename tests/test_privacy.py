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
