"""Z-order key correctness and layout behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import layout as ly


def test_zorder_interleave_hand_values(spark):
    # mn=0, mx=255 anchors make the 8-bit scaling the identity
    rows = [(0, 0), (255, 255), (3, 1), (1, 3), (255, 0), (0, 255)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    out = {(r["x"], r["y"]): r["zkey"]
           for r in ly.with_zorder_key(df, ["x", "y"], bits=8).collect()}
    def morton(x, y):
        k = 0
        for i in range(8):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k
    assert out == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_repartition_ranges_are_disjoint(spark):
    df = spark.range(4000).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("bigint").alias("b")
    )
    parts = (
        ly.with_zorder_key(df, ["a", "b"], bits=8)
        .repartitionByRange(8, "zkey")
        .select("zkey", F.spark_partition_id().alias("pid"))
        .groupBy("pid").agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo").collect()
    )
    # range partitioning: consecutive partitions cover disjoint key ranges,
    # which is what makes per-file min/max footer stats selective
    for prev, cur in zip(parts, parts[1:]):
        assert prev["hi"] <= cur["lo"]


def test_plan_shards_matches_python_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 500)) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    from pyspark_playground_spark.operators.layout import plan_shards

    got = {
        r["doc_id"]: r["shard"]
        for r in plan_shards(
            df, bytes_column="n_chars", target_bytes=1000,
            order_column="doc_id",
        ).collect()
    }
    cum = 0
    for i, b in rows:
        assert got[i] == cum // 1000, i
        cum += b
    # shard ids are contiguous from 0 and every full shard holds >= target
    # minus the largest doc (a doc never splits)
    sizes = {}
    for i, b in rows:
        sizes[got[i]] = sizes.get(got[i], 0) + b
    assert set(sizes) == set(range(max(sizes) + 1))
    for s, total in sizes.items():
        if s < max(sizes):
            assert total >= 1000 - 500
