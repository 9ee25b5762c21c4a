"""Mixture-serialization operators: shard diversity report, round-robin
interleave (closed form vs the window definition), Gini coefficient."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import layout as ly
from pyspark_playground_spark.operators import sampling as smp
from pyspark_playground_spark.operators.profiling import gini_coefficient


def test_shard_mixture_report_hhi(spark):
    df = spark.createDataFrame(
        [(0, "a"), (0, "a"), (0, "b"), (0, "b"), (1, "a")],
        ["shard", "source"],
    )
    out = {
        r["shard"]: r
        for r in ly.shard_mixture_report(
            df, shard_column="shard", group_column="source"
        ).collect()
    }
    assert out[0]["n_rows"] == 4 and out[0]["n_groups"] == 2
    assert out[0]["hhi_q6"] == 500_000  # (4+4)/16
    assert out[1]["n_rows"] == 1 and out[1]["hhi_q6"] == 1_000_000


def test_interleave_closed_form_equals_window(spark):
    # uneven group sizes exercise the drop-out arithmetic
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(20)] + [
        (100 + i, "a") for i in range(7)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = smp.interleave_by_group(
        df, group_column="source", order_column="doc_id"
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    expected = (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .withColumn(
            "global_pos",
            F.row_number().over(Window.orderBy("rank_in_group", "source")) - 1,
        )
    )
    g = {(r["doc_id"], r["global_pos"]) for r in got.collect()}
    e = {(r["doc_id"], r["global_pos"]) for r in expected.collect()}
    assert g == e
    # positions are a permutation of 0..n-1
    assert sorted(p for _, p in g) == list(range(27))


def test_interleave_first_round_is_one_of_each(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "z")], ["doc_id", "source"]
    )
    out = smp.interleave_by_group(
        df, group_column="source", order_column="doc_id"
    ).collect()
    by_pos = {r["global_pos"]: r["source"] for r in out}
    assert [by_pos[p] for p in range(4)] == ["x", "y", "z", "x"]


def test_gini_uniform_and_concentrated(spark):
    uniform = spark.createDataFrame(
        [(i, 5) for i in range(4)], ["doc_id", "v"]
    )
    row = gini_coefficient(uniform, value_column="v", id_column="doc_id").first()
    assert row["gini_q6"] == 0
    assert row["n_rows"] == 4 and row["total"] == 20

    conc = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 4)], ["doc_id", "v"]
    )
    row = gini_coefficient(conc, value_column="v", id_column="doc_id").first()
    assert row["gini_q6"] == 750_000


def test_gini_zero_total_is_null(spark):
    df = spark.createDataFrame([(0, 0), (1, 0)], ["doc_id", "v"])
    row = gini_coefficient(df, value_column="v", id_column="doc_id").first()
    assert row["gini_q6"] is None
