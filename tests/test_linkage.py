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


def test_fellegi_sunter_weights_and_classification(spark):
    """Python mirror of the exact u-census + quantized-ln weight chain;
    agreement raises the score, disagreement on a high-cardinality
    field costs more than on a low-cardinality one; max_block fences a
    hot block; NULL never agrees."""
    import math

    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.linkage import (
        fellegi_sunter_pairs,
    )

    rows = [
        # id, blk, brand (2 values), size (4 values)
        (1, "x", "A", 10),
        (2, "x", "A", 10),    # full agree with 1
        (3, "x", "B", 10),    # brand disagree with 1
        (4, "x", "A", 20),    # size disagree with 1
        (5, "y", "B", 30),
        (6, "y", "B", 40),
        (7, "y", None, 40),   # NULL brand: never agrees
    ]
    df = spark.createDataFrame(
        rows, "rid bigint, blk string, brand string, size bigint"
    )
    out = {(r["id_a"], r["id_b"]): r for r in fellegi_sunter_pairs(
        df, "rid", ["brand", "size"], block=F.col("blk"),
        m_ppm=950_000, threshold_q6=0,
    ).collect()}

    def weight(vals, m=0.95):
        cnt = {}
        for v in vals:
            if v is not None:
                cnt[v] = cnt.get(v, 0) + 1
        num = sum(c * c for c in cnt.values())
        den = sum(cnt.values())
        dd = float(den) * float(den)
        qln = lambda x: math.floor(math.log(x) * 1e9 + 0.5) / 1e9
        q6 = lambda x: math.floor(x * 1e6 + 0.5)
        wa = q6(qln(m * dd / float(num)) / 0.6931471805599453)
        wd = q6(qln((1.0 - m) * dd / (dd - float(num)))
                / 0.6931471805599453)
        return wa, wd

    wa_b, wd_b = weight([r[2] for r in rows])
    wa_s, wd_s = weight([r[3] for r in rows])
    assert out[(1, 2)]["weight_q6"] == wa_b + wa_s
    assert bool(out[(1, 2)]["is_match"]) is True
    assert out[(1, 3)]["weight_q6"] == wd_b + wa_s
    assert out[(1, 4)]["weight_q6"] == wa_b + wd_s
    # size (4 distinct values) is stronger evidence than brand (2):
    # agreeing on it earns more, and u_size < u_brand
    assert wa_s > wa_b > 0 > wd_b
    # NULL brand never agrees
    assert bool(out[(6, 7)]["agree_brand"]) is False
    assert out[(6, 7)]["weight_q6"] == wd_b + wa_s

    # max_block drops the hot block entirely
    fenced = fellegi_sunter_pairs(
        df, "rid", ["brand", "size"], block=F.col("blk"),
        max_block=3,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in fenced} == {
        (5, 6), (5, 7), (6, 7)
    }


def test_resolve_entities_clusters_and_survivorship(spark):
    """Chain 1-2, 2-3 merges into one entity labeled by the smallest
    key; pair 5-6 forms its own; 4 stays a singleton; canonical flags
    and sizes are exact."""
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.linkage import (
        resolve_entities,
    )

    recs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "rid bigint"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
    )
    out = {r["rid"]: r for r in resolve_entities(
        recs, "rid", pairs).collect()}
    assert {r: out[r]["entity_id"] for r in out} == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5
    }
    # sorted: collect() order follows partition arrival, which varies
    # with shard parallelism (flaked once in the 4-shard suite run)
    assert sorted(r for r in out if out[r]["is_canonical"]) == [1, 4, 5]
    assert out[2]["entity_size"] == 3 and out[4]["entity_size"] == 1
    assert out[6]["entity_size"] == 2


def test_fellegi_sunter_all_null_field_carries_no_evidence(spark):
    """Review regression: a field with NO populated values must not
    NULL every pair's score — it contributes exactly 0 to both
    agreement and disagreement, and the remaining fields still
    classify."""
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.linkage import (
        fellegi_sunter_pairs,
    )

    rows = [
        (1, "x", "A", None), (2, "x", "A", None), (3, "x", "B", None),
    ]
    df = spark.createDataFrame(
        rows, "rid bigint, blk string, brand string, ghost string"
    )
    out = {(r["id_a"], r["id_b"]): r for r in fellegi_sunter_pairs(
        df, "rid", ["brand", "ghost"], block=F.col("blk"),
    ).collect()}
    assert len(out) == 3
    assert out[(1, 2)]["weight_q6"] is not None
    assert out[(1, 2)]["weight_q6"] > 0 > out[(1, 3)]["weight_q6"]
    # ghost never agrees and never costs anything
    assert all(not r["agree_ghost"] for r in out.values())
