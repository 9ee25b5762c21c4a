"""Blocked fuzzy record linkage (operators/linkage.py)."""

import pytest
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import linkage as lk


@pytest.fixture(scope="module")
def names_df(spark):
    rows = [
        ("acme corp",),
        ("Acme  Corp",),  # exact dup after normalization
        ("acme c0rp",),  # dist 1 from acme corp
        ("acme corporation",),  # dist 7 — outside the band
        ("zebra inc",),  # different block
        ("zebra 1nc",),  # dist 1, same block as zebra inc
    ]
    return spark.createDataFrame(rows, ["name"])


def test_canonicalize_collapses_exact_dups_with_counts(spark, names_df):
    pairs = lk.blocked_fuzzy_pairs(names_df, "name", max_dist=2).collect()
    by_pair = {(r.name_a, r.name_b): r for r in pairs}
    assert ("acme c0rp", "acme corp") in by_pair
    r = by_pair[("acme c0rp", "acme corp")]
    assert r.dist == 1
    # the two normalized-identical spellings collapsed to multiplicity 2
    assert r.count_b == 2 and r.count_a == 1
    assert ("zebra 1nc", "zebra inc") in by_pair
    # far pair never surfaces
    assert all(r.dist <= 2 for r in pairs)


def test_blocking_prevents_cross_block_pairs(spark, names_df):
    pairs = lk.blocked_fuzzy_pairs(names_df, "name", max_dist=100).collect()
    for r in pairs:
        assert r.name_a[0] == r.name_b[0]


def test_max_block_fences_hot_blocks(spark):
    rows = [(f"hot{i}",) for i in range(10)] + [("cold1",), ("cold2",)]
    df = spark.createDataFrame(rows, ["name"])
    fenced = lk.blocked_fuzzy_pairs(df, "name", max_dist=5, max_block=5).collect()
    # the 10-name 'h' block is dropped; the 2-name 'c' block survives
    assert all(r.name_a.startswith("c") for r in fenced)
    assert len(fenced) == 1


def test_custom_block_expression(spark, names_df):
    # blocking on the full first token separates 'acme'/'zebra' identically
    pairs = lk.blocked_fuzzy_pairs(
        names_df,
        "name",
        block=F.split(F.col("name"), " ")[0],
        max_dist=2,
    ).collect()
    assert {(r.name_a, r.name_b) for r in pairs} == {
        ("acme c0rp", "acme corp"),
        ("zebra 1nc", "zebra inc"),
    }


def test_string_node_entity_resolution_composes_with_cc(spark):
    """Fuzzy pairs over string nodes resolve through connected components
    to lexicographic-min canonicals — chains collapse transitively."""
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators import linkage as lk
    from pyspark_playground_spark.operators.graph import connected_components

    # chain: aaaa ~ aaab ~ aabb (dist 1 apart); island: zzzz
    df = spark.createDataFrame(
        [("aaaa",), ("aaab",), ("aabb",), ("zzzz",)], ["name"]
    )
    pairs = lk.blocked_fuzzy_pairs(df, "name", max_dist=1).select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    comp = {r.node: r.component
            for r in connected_components(pairs).collect()}
    assert comp["aaaa"] == comp["aaab"] == comp["aabb"] == "aaaa"
    assert "zzzz" not in comp  # isolated nodes are the caller's coalesce
