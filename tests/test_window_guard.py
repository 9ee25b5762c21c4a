"""Census-window plan-guard mechanics (VERDICT r6 item 4).

The full-registry sweep is ``scripts/window_guard.py`` (run per round —
~3 min, too heavy for the suite); these tests pin the guard itself:
red on a deliberately unpartitioned raw-frame window, green on one
representative entry per documented bounded shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.plans.window_guard import (
    unpartitioned_window_violations,
)


def test_guard_flags_raw_frame_global_window(spark, sf_dir):
    """The exact regression the guard exists for: a row_number over the
    whole corpus with no partitioning — one task sorts everything."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    v = unpartitioned_window_violations(bad)
    assert len(v) == 1 and "unbounded" in v[0]


def test_guard_flags_join_with_one_raw_side(spark, sf_dir):
    """A census joined back onto the raw corpus then globally ranked is
    still corpus-sized — one bounded branch must not whitelist it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    census = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    bad = docs.join(census, "lang").withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert unpartitioned_window_violations(bad)


def test_guard_accepts_census_bounded_window(spark, sf_dir):
    """The repo's canonical shape: a global cumulative over an Aggregate
    (value census) is bounded by value cardinality — no violation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    census = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    ok = census.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
    )
    assert unpartitioned_window_violations(ok) == []


def test_guard_accepts_limit_bounded_window(spark, sf_dir):
    """The TakeOrdered-then-rank candidate-list shape (rrf_fuse): the
    window runs over a limit(n) frame — bounded by the constant."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = docs.orderBy(F.col("n_chars").desc(), "doc_id").limit(50)
    ok = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("n_chars").desc()))
    )
    assert unpartitioned_window_violations(ok) == []


@pytest.mark.parametrize(
    "name",
    [
        # one per documented bounded family: bucketed cumulative census
        # (pr_curve), per-group census window (mondrian), candidate-list
        # limit (hybrid RRF), local model frame (isotonic's bin table),
        # bucketed global shuffle (deterministic permutation)
        "pr_curve_length_en_documents",
        "mondrian_conformal_documents",
        "hybrid_rrf_documents",
        "isotonic_calibration_documents",
        "deterministic_shuffle_documents",
    ],
)
def test_guard_green_on_representative_entries(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert unpartitioned_window_violations(df) == []
